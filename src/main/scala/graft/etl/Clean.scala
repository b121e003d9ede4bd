package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema reconciliation + validity filtering.
  *
  * Re-expresses the reference's dynamic schema layer
  * (`/root/reference/src/etl/clean.py`) as pure `DataFrame => DataFrame`
  * functions:
  *   - P1 synonym rename (`clean.py:3-28`): case-insensitive source->canonical
  *     column mapping.
  *   - P2 required-column assertion (`clean.py:30-33`).
  *   - P3 default-column injection (`clean.py:35-41`): literal defaults applied
  *     ONLY when the column is missing entirely (type quirk preserved: the
  *     default's type wins only in the absent case).
  *   - F1 validity filter (`clean.py:43-49`).
  *
  * All of these are plan-construction-time logic over `df.columns` — zero
  * runtime cost beyond the resulting Project/Filter nodes, which Catalyst
  * pushes into the parquet scan. Scale-safe by construction.
  */
object Clean {

  /** Canonical-name -> accepted source spellings (case-insensitive).
    * Mirrors MAPA_COLUMNAS_TLC (`/root/reference/src/etl/clean.py:3-15`). */
  val TlcSynonyms: Map[String, Seq[String]] = Map(
    "pickup_datetime" -> Seq("tpep_pickup_datetime", "pickup_datetime", "lpep_pickup_datetime"),
    "dropoff_datetime" -> Seq("tpep_dropoff_datetime", "dropoff_datetime", "lpep_dropoff_datetime"),
    "trip_distance" -> Seq("trip_distance"),
    "fare_amount" -> Seq("fare_amount"),
    "total_amount" -> Seq("total_amount"),
    "passenger_count" -> Seq("passenger_count"),
    "payment_type" -> Seq("payment_type"),
    "pu_location" -> Seq("pulocationid", "pu_location_id", "pu_location"),
    "do_location" -> Seq("dolocationid", "do_location_id", "do_location"),
    "vendor_id" -> Seq("vendorid", "vendor_id"),
    "ratecode_id" -> Seq("ratecodeid", "ratecode_id")
  )

  /** P1: rename source columns to canonical names, case-insensitively.
    * First matching synonym wins; non-mapped columns pass through unchanged. */
  def standardizeColumns(df: DataFrame, synonyms: Map[String, Seq[String]] = TlcSynonyms): DataFrame = {
    val lower = df.columns.map(c => c.toLowerCase -> c).toMap
    synonyms.foldLeft(df) { case (acc, (canonical, sources)) =>
      sources.collectFirst {
        case s if lower.contains(s.toLowerCase) => lower(s.toLowerCase)
      } match {
        case Some(actual) if actual != canonical => acc.withColumnRenamed(actual, canonical)
        case _ => acc
      }
    }
  }

  /** P2: hard failure when required columns are absent
    * (`/root/reference/src/etl/clean.py:30-33`). */
  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.map(_.toLowerCase).toSet.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    df
  }

  /** P3: inject literal defaults for columns missing entirely
    * (`/root/reference/src/etl/clean.py:35-41`). */
  def ensureColumns(df: DataFrame, defaults: Map[String, Any]): DataFrame = {
    val present = df.columns.map(_.toLowerCase).toSet
    defaults.foldLeft(df) { case (acc, (name, default)) =>
      if (present.contains(name.toLowerCase)) acc
      else acc.withColumn(name, lit(default))
    }
  }

  /** Reference defaults (`/root/reference/scripts/02_spark_etl.py:92-100`) —
    * note the string "desconocido" for otherwise-numeric code columns. */
  val TlcDefaults: Map[String, Any] = Map(
    "total_amount" -> 0.0,
    "passenger_count" -> 0,
    "payment_type" -> "desconocido",
    "pu_location" -> "desconocido",
    "do_location" -> "desconocido",
    "vendor_id" -> "desconocido",
    "ratecode_id" -> "desconocido"
  )

  /** P4: ordered, presence-tolerant projection
    * (`/root/reference/scripts/02_spark_etl.py:102-116`). */
  def selectPresent(df: DataFrame, ordered: Seq[String]): DataFrame = {
    val present = df.columns.map(_.toLowerCase).toSet
    val keep = ordered.filter(c => present.contains(c.toLowerCase))
    df.select(keep.map(col): _*)
  }

  /** F1: validity filter (`/root/reference/src/etl/clean.py:43-49`).
    * Chained conjunction; Catalyst fuses and pushes to the scan. */
  def filterValid(df: DataFrame, positiveCols: Seq[String], nonNullCols: Seq[String]): DataFrame = {
    val pos = positiveCols.map(col(_) > 0)
    val nn = nonNullCols.map(col(_).isNotNull)
    (pos ++ nn).foldLeft(df)((acc, p) => acc.filter(p))
  }
}
