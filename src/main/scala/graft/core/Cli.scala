package graft.core

/** U5: the reference's CLI flag surface (`/root/reference/scripts/00:64-86`,
  * `02:30-61`, `03:17-32`, `04:20-55`, `05:17-49`, `06:17-59`) as a
  * dependency-free parser. Flag names are kept verbatim (Spanish included)
  * so reference invocations port 1:1.
  */
object Cli {

  final case class JobConfig(
      year: Int = 2024,
      month: Option[Int] = None,
      months: Seq[Int] = Nil,
      quarter: Option[Int] = None,
      rawRoot: String = "",
      curatedRoot: String = "",
      outRoot: String = "",
      master: Option[String] = None,
      appName: String = "graft",
      p1: Double = 0.01,
      p99: Double = 0.99,
      sampleFrac: Option[Double] = None,
      maxRows: Option[Int] = None,
      sinOutliers: Boolean = false,
      skipMissing: Boolean = false,
      algoritmo: String = "gbt",
      // scripts 04/05/06 surface. hdfsUri defaults empty (= plain local
      // paths); the reference's docker default is hdfs://namenode:8020 and
      // callers pass it via --hdfs-uri when running against a cluster.
      hdfsUri: String = "",
      modelRoot: String = "/models/tlc_trip_duration",
      metricsRoot: String = "/reports/metrics/tlc_trip_duration",
      predictionsRoot: String = "/data/tlc/predictions",
      martsRoot: String = "/data/tlc/marts",
      outputDir: String = "data/export",
      usarSubdir: Boolean = false,
      exportarMetricas: Boolean = false,
      exportarErrores: Boolean = false,
      // script 00 (download/manifest) + 01 (hdfs put) surface
      baseUrl: String = "",
      manifestPath: Option[String] = None,
      force: Boolean = false,
      localDir: String = "data/raw"
  ) {
    def resolvedMonths: Seq[String] = Months.resolve(month, months, quarter)

    /** `unir_ruta` (`scripts/04_train_sparkml.py:14-17`): prefix an absolute
      * data path with the HDFS URI when one is configured. */
    def uri(path: String): String =
      if (hdfsUri.nonEmpty) hdfsUri.stripSuffix("/") + path else path
  }

  def parse(args: Seq[String]): JobConfig = {
    def loop(rest: List[String], cfg: JobConfig): JobConfig = rest match {
      case Nil => cfg
      case "--year" :: v :: t => loop(t, cfg.copy(year = v.toInt))
      case "--month" :: v :: t => loop(t, cfg.copy(month = Some(v.toInt)))
      case "--months" :: v :: t => loop(t, cfg.copy(months = v.split(",").map(_.trim.toInt).toSeq))
      case "--quarter" :: v :: t => loop(t, cfg.copy(quarter = Some(v.toInt)))
      case "--raw-root" :: v :: t => loop(t, cfg.copy(rawRoot = v))
      case "--curated-root" :: v :: t => loop(t, cfg.copy(curatedRoot = v))
      case "--out-root" :: v :: t => loop(t, cfg.copy(outRoot = v))
      case "--master" :: v :: t => loop(t, cfg.copy(master = Some(v)))
      case "--app-name" :: v :: t => loop(t, cfg.copy(appName = v))
      case "--p1" :: v :: t => loop(t, cfg.copy(p1 = v.toDouble))
      case "--p99" :: v :: t => loop(t, cfg.copy(p99 = v.toDouble))
      case "--sample-frac" :: v :: t => loop(t, cfg.copy(sampleFrac = Some(v.toDouble)))
      case "--max-rows" :: v :: t => loop(t, cfg.copy(maxRows = Some(v.toInt)))
      case "--sin-outliers" :: t => loop(t, cfg.copy(sinOutliers = true))
      case "--skip-missing" :: t => loop(t, cfg.copy(skipMissing = true))
      case "--algoritmo" :: v :: t =>
        require(v == "gbt" || v == "rf", s"--algoritmo inválido: $v (gbt|rf)")
        loop(t, cfg.copy(algoritmo = v))
      case "--hdfs-uri" :: v :: t => loop(t, cfg.copy(hdfsUri = v))
      case "--model-root" :: v :: t => loop(t, cfg.copy(modelRoot = v))
      case "--metrics-root" :: v :: t => loop(t, cfg.copy(metricsRoot = v))
      case "--predictions-root" :: v :: t => loop(t, cfg.copy(predictionsRoot = v))
      case "--marts-root" :: v :: t => loop(t, cfg.copy(martsRoot = v))
      case "--output-dir" :: v :: t => loop(t, cfg.copy(outputDir = v))
      case "--usar-subdir" :: t => loop(t, cfg.copy(usarSubdir = true))
      case "--exportar-metricas" :: t => loop(t, cfg.copy(exportarMetricas = true))
      case "--exportar-errores" :: t => loop(t, cfg.copy(exportarErrores = true))
      case "--base-url" :: v :: t => loop(t, cfg.copy(baseUrl = v))
      case "--manifest-path" :: v :: t => loop(t, cfg.copy(manifestPath = Some(v)))
      case "--force" :: t => loop(t, cfg.copy(force = true))
      case "--local-dir" :: v :: t => loop(t, cfg.copy(localDir = v))
      case "--hdfs-raw-root" :: v :: t => loop(t, cfg.copy(rawRoot = v))
      case other :: _ => throw new IllegalArgumentException(s"flag desconocido: $other")
    }
    loop(args.toList, JobConfig())
  }
}
