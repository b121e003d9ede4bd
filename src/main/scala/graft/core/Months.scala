package graft.core

/** U1/U2: month resolution + path templates
  * (`/root/reference/src/utils/fechas.py:1-33`, `scripts/02_spark_etl.py:24-27`).
  *
  * Reference CLI contract: exactly one of --month / --months / --quarter;
  * months validated in 1-12 and zero-padded; quarters map Q1 -> 01,02,03 etc.
  */
object Months {

  /** `normalizar_mes` (`fechas.py:1-9`): validate and zero-pad. */
  def normalize(m: Int): String = {
    require(m >= 1 && m <= 12, s"mes inválido: $m (1-12)")
    f"$m%02d"
  }

  /** `resolver_meses` (`fechas.py:11-32`): exactly one selector. */
  def resolve(month: Option[Int], months: Seq[Int], quarter: Option[Int]): Seq[String] = {
    val selectors = Seq(month.isDefined, months.nonEmpty, quarter.isDefined).count(identity)
    require(selectors == 1, "exactamente uno de --month/--months/--quarter")
    (month, months, quarter) match {
      case (Some(m), _, _) => Seq(normalize(m))
      case (_, ms, _) if ms.nonEmpty => ms.map(normalize)
      case (_, _, Some(q)) =>
        require(q >= 1 && q <= 4, s"trimestre inválido: $q (1-4)")
        ((q - 1) * 3 + 1 to (q - 1) * 3 + 3).map(normalize)
      case _ => throw new IllegalArgumentException("unreachable")
    }
  }

  /** `unir_ruta` + year=/month= templates (U2). */
  def joinPath(base: String, rest: String): String =
    base.stripSuffix("/") + "/" + rest.stripPrefix("/")
  def partitionPath(root: String, year: Int, month: String): String =
    joinPath(root, s"year=$year/month=$month")
}
