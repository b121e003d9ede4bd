package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derived feature columns, mirroring `/root/reference/src/etl/features.py`.
  *
  * All pure column expressions — whole-stage-codegen friendly, no UDFs.
  * Semantic traps preserved (SURVEY.md §7.3): `dayofweek` 1=Sunday..7=Saturday;
  * weekend = dow IN (1,7); duration divides by 60.0 forcing double.
  */
object Features {

  /** E1: trip duration in minutes (`features.py:3-7`). */
  def withDurationMin(df: DataFrame, start: String, end: String, out: String = "trip_duration_min"): DataFrame =
    df.withColumn(out, (unix_timestamp(col(end)) - unix_timestamp(col(start))) / 60.0)

  /** E2-E4: hour, day-of-week (1=Sunday), weekend flag (`features.py:9-12`). */
  def withTemporal(df: DataFrame, ts: String, prefix: String = "pickup"): DataFrame =
    df.withColumn(s"${prefix}_hour", hour(col(ts)))
      .withColumn(s"${prefix}_dow", dayofweek(col(ts)))
      .withColumn("is_weekend", col(s"${prefix}_dow").isin(1, 7).cast("int"))

  /** P6: literal string partition columns, month zero-padded
    * (`features.py:14-16`, `src/utils/fechas.py:1-9`). */
  def withPartitions(df: DataFrame, year: Int, month: Int): DataFrame =
    df.withColumn("year", lit(year.toString))
      .withColumn("month", lit(f"$month%02d"))
}
