package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 11 aggregate marts (SURVEY.md §2.5 A1-A8, plus A9 from the export job),
  * re-expressed as pure `DataFrame => DataFrame` functions over a prepared
  * trips-shaped frame. Column names are parameters so the same operators run
  * on the TLC shape and on the synthetic `events` analog
  * (ts->pickup, value->fare, event_type->payment, user_id->location).
  *
  * Every mart is a partial+final hash aggregate (map-side combine is free from
  * Catalyst); top-k marts compile to `TakeOrderedAndProject` (no global sort).
  * Output column names follow the reference's export schemas
  * (`/root/repo/FIXTURES.md` §A3).
  */
object Marts {

  /** A1: global KPIs (`/root/reference/scripts/03_spark_eda_agg.py:76-80`). */
  def kpis(df: DataFrame, duration: String, fare: String): DataFrame =
    df.agg(
      count(lit(1)).as("total_viajes"),
      avg(col(duration)).as("duracion_promedio_min"),
      avg(col(fare)).as("tarifa_promedio")
    )

  /** A2: trip counts by hour x day-of-week (`03:58-62`). */
  def tripsByHourDow(df: DataFrame, hour: String, dow: String): DataFrame =
    df.groupBy(col(hour), col(dow))
      .agg(count(lit(1)).as("total_viajes"))
      .orderBy(col(dow), col(hour))

  /** A3/A4: per-hour average of a metric (`03:64-74`). The reference's
    * fare-column fallback (total_amount else fare_amount, `03:56`) is
    * plan-construction logic — see [[fareColumn]]. */
  def avgByHour(df: DataFrame, hour: String, metric: String, out: String): DataFrame =
    df.groupBy(col(hour)).agg(avg(col(metric)).as(out)).orderBy(col(hour))

  /** Fare-column fallback decided from the schema at plan time (`03:56`). */
  def fareColumn(df: DataFrame): String =
    if (df.columns.contains("total_amount")) "total_amount" else "fare_amount"

  /** A5: top-k zones by trip count with per-zone averages (`03:82-104`).
    * `orderBy(desc).limit(k)` -> physical TakeOrderedAndProject: each task
    * keeps a k-row heap, driver merges k*tasks rows — no global sort, scales
    * with k not with data. Tie-broken on the key for determinism. */
  def topZones(df: DataFrame, zone: String, distance: String, duration: String,
               fare: String, k: Int = 20): DataFrame =
    df.groupBy(col(zone))
      .agg(
        count(lit(1)).as("total_viajes"),
        avg(col(distance)).as("distancia_promedio"),
        avg(col(duration)).as("duracion_promedio_min"),
        avg(col(fare)).as("tarifa_promedio")
      )
      .orderBy(desc("total_viajes"), col(zone))
      .limit(k)

  /** A6: distribution by a categorical key (payment_type / vendor_id,
    * `03:106-124`). */
  def byCategory(df: DataFrame, key: String, duration: String, fare: String): DataFrame =
    df.groupBy(col(key))
      .agg(
        count(lit(1)).as("total_viajes"),
        avg(col(duration)).as("duracion_promedio_min"),
        avg(col(fare)).as("tarifa_promedio")
      )
      .orderBy(desc("total_viajes"), col(key))

  /** E5: 6-way distance bucketing CASE chain with parallel sort ordinal
    * (`03:126-144`). Strict `<` boundary semantics preserved. */
  def withDistanceBins(df: DataFrame, distance: String): DataFrame = {
    val d = col(distance)
    df.withColumn(
        "distancia_bin",
        when(d < 1, "0-1").when(d < 3, "1-3").when(d < 5, "3-5")
          .when(d < 10, "5-10").when(d < 20, "10-20").otherwise("20+")
      )
      .withColumn(
        "distancia_orden",
        when(d < 1, 1).when(d < 3, 2).when(d < 5, 3)
          .when(d < 10, 4).when(d < 20, 5).otherwise(6)
      )
  }

  /** A7: distance-bin distribution (`03:126-153`). */
  def distanceBins(df: DataFrame, distance: String, duration: String, fare: String): DataFrame =
    withDistanceBins(df, distance)
      .groupBy(col("distancia_bin"), col("distancia_orden"))
      .agg(
        count(lit(1)).as("total_viajes"),
        avg(col(distance)).as("distancia_promedio"),
        avg(col(duration)).as("duracion_promedio_min"),
        avg(col(fare)).as("tarifa_promedio")
      )
      .orderBy(col("distancia_orden"))

  /** A8: variability mart — count/avg/stddev(sample)/p25-p50-p75 for duration
    * and fare, percentile arrays unpacked then dropped (`03:155-213`).
    *
    * `exact = false` reproduces the reference (`percentile_approx`, accuracy
    * 10000); `exact = true` uses exact `percentile` (single sort-based agg) so
    * the result is reproducible in ANSI SQL (`quantile_cont`) for the oracle.
    */
  def variability(df: DataFrame, key: String, duration: String, fare: String,
                  exact: Boolean = false): DataFrame = {
    def pct(c: String, p: Double) =
      if (exact) expr(s"percentile($c, $p)") else expr(s"percentile_approx($c, $p, 10000)")
    df.groupBy(col(key))
      .agg(
        count(lit(1)).as("total_viajes"),
        avg(col(duration)).as("duracion_promedio_min"),
        stddev(col(duration)).as("duracion_std"),
        avg(col(fare)).as("tarifa_promedio"),
        stddev(col(fare)).as("tarifa_std"),
        pct(duration, 0.25).as("duracion_p25"),
        pct(duration, 0.50).as("duracion_p50"),
        pct(duration, 0.75).as("duracion_p75"),
        pct(fare, 0.25).as("tarifa_p25"),
        pct(fare, 0.50).as("tarifa_p50"),
        pct(fare, 0.75).as("tarifa_p75")
      )
      .orderBy(col(key))
  }

  /** A9 + E6-E8: per-hour prediction-error mart
    * (`/root/reference/scripts/06_export_for_dashboard.py:162-180`):
    * MAE = avg(|pred-label|), RMSE = sqrt(avg((pred-label)^2)). */
  def errorsByHour(df: DataFrame, hour: String, pred: String, label: String): DataFrame = {
    val diff = col(pred) - col(label)
    df.groupBy(col(hour))
      .agg(
        count(lit(1)).as("total_viajes"),
        avg(abs(diff)).as("mae"),
        sqrt(avg(pow(diff, 2))).as("rmse"),
        avg(col(pred)).as("pred_promedio"),
        avg(col(label)).as("real_promedio")
      )
      .orderBy(col(hour))
  }
}
