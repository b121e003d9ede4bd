package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.etl.{Clean, Features, Outliers}
import graft.marts.Marts
import graft.serve.Report

/** Relational spine queries: scans, ETL, the 11 marts, promoted dashboard
  * operators, joins, windows, set ops (SURVEY.md §2.1-2.8).
  *
  * Each mirrors a reference operator (citations inline) but runs over the
  * synthetic tables per /root/repo/FIXTURES.md §B: events plays the trips
  * table (ts->pickup_datetime, value->fare, event_type->payment_type,
  * user_id->location); lineitem/orders/customer exercise the promoted joins.
  */
object CoreQueries {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")

  /** Exact decimal sum surfaced as double — order-insensitive, cross-engine
    * reproducible (unlike double summation). */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Events with the reference ETL chain applied: P1 rename, P3 defaults,
    * F1 validity, E2-E4 temporal features. */
  private def cleanEvents(spark: SparkSession, dir: String): DataFrame = {
    val renamed = Clean.standardizeColumns(
      Tables.events(spark, dir),
      Map("event_ts" -> Seq("TS", "event_ts"), "amount" -> Seq("VALUE", "amount"))
    )
    val defaulted = Clean.ensureColumns(renamed, Map("channel" -> "desconocido"))
    val valid = Clean.filterValid(defaulted, Seq("amount"), Seq("event_ts"))
    Features.withTemporal(valid, "event_ts", "event")
  }

  val all: Seq[QuerySpec] = Seq(
    // ---- S1 + P4: pruned projection with pushed-down predicate ------------
    QuerySpec(
      "s1_scan_pruned",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp") && col("l_quantity") > 45)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 45
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),

    // ---- TPC-H Q1-shaped pricing summary (A1-family group agg) ------------
    QuerySpec(
      "q1_pricing",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        val discPrice = dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(discPrice).cast("double").as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(avg(col("l_discount")), 6).as("avg_disc"),
            count(lit(1)).as("count_order")
          )
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
             |  ROUND(AVG(l_quantity), 4) AS avg_qty,
             |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
             |  ROUND(AVG(l_discount), 6) AS avg_disc,
             |  COUNT(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),

    // ---- P1+P3+F1+E2-E4: the ETL chain end-to-end --------------------------
    QuerySpec(
      "etl_clean_events",
      (s, dir) =>
        cleanEvents(s, dir)
          .select(
            col("event_id"),
            col("user_id"),
            col("event_type"),
            col("amount"),
            col("channel"),
            col("event_hour").cast("long").as("event_hour"),
            col("event_dow").cast("long").as("event_dow"),
            col("is_weekend").cast("long").as("is_weekend")
          )
          .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, event_type, value AS amount,
             |  'desconocido' AS channel,
             |  CAST(hour(ts) AS BIGINT) AS event_hour,
             |  CAST(dayofweek(ts) + 1 AS BIGINT) AS event_dow,
             |  CAST(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS BIGINT) AS is_weekend
             |FROM events WHERE value > 0 AND ts IS NOT NULL
             |ORDER BY event_id""".stripMargin)
    ),

    // ---- A1: global KPIs ----------------------------------------------------
    QuerySpec(
      "a1_kpis",
      (s, dir) =>
        Tables.events(s, dir)
          .agg(
            count(lit(1)).as("total_viajes"),
            round(avg(col("value")), 4).as("tarifa_promedio"),
            dsum(col("value")).as("tarifa_total")
          ),
      Some("""SELECT COUNT(*) AS total_viajes,
             |  ROUND(AVG(value), 4) AS tarifa_promedio,
             |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS tarifa_total
             |FROM events""".stripMargin)
    ),

    // ---- A2: counts by hour x dow ------------------------------------------
    QuerySpec(
      "a2_hour_dow",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        Marts.tripsByHourDow(e, "event_hour", "event_dow")
          .select(col("event_hour").cast("long"), col("event_dow").cast("long"), col("total_viajes"))
          .orderBy(col("event_dow"), col("event_hour"))
      },
      Some("""SELECT CAST(hour(ts) AS BIGINT) AS event_hour,
             |  CAST(dayofweek(ts) + 1 AS BIGINT) AS event_dow,
             |  COUNT(*) AS total_viajes
             |FROM events GROUP BY 1, 2 ORDER BY event_dow, event_hour""".stripMargin)
    ),

    // ---- A3/A4: per-hour average metric ------------------------------------
    QuerySpec(
      "a3_avg_value_hour",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        Marts.avgByHour(e, "event_hour", "value", "tarifa_promedio")
          .select(col("event_hour").cast("long"), round(col("tarifa_promedio"), 4).as("tarifa_promedio"))
          .orderBy(col("event_hour"))
      },
      Some("""SELECT CAST(hour(ts) AS BIGINT) AS event_hour,
             |  ROUND(AVG(value), 4) AS tarifa_promedio
             |FROM events GROUP BY 1 ORDER BY event_hour""".stripMargin)
    ),

    // ---- A5/O2/O3: top-k by count desc (TakeOrderedAndProject) -------------
    QuerySpec(
      "a5_top_users",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("total_viajes"),
            round(avg(col("value")), 4).as("tarifa_promedio")
          )
          .orderBy(desc("total_viajes"), col("user_id"))
          .limit(20),
      Some("""SELECT user_id, COUNT(*) AS total_viajes, ROUND(AVG(value), 4) AS tarifa_promedio
             |FROM events GROUP BY user_id
             |ORDER BY total_viajes DESC, user_id LIMIT 20""".stripMargin)
    ),

    // ---- A6: categorical distribution ---------------------------------------
    QuerySpec(
      "a6_by_type",
      (s, dir) =>
        Marts.byCategory(Tables.events(s, dir), "event_type", "value", "value")
          .select(
            col("event_type"),
            col("total_viajes"),
            round(col("duracion_promedio_min"), 4).as("duracion_promedio_min"),
            round(col("tarifa_promedio"), 4).as("tarifa_promedio")
          )
          .orderBy(desc("total_viajes"), col("event_type")),
      Some("""SELECT event_type, COUNT(*) AS total_viajes,
             |  ROUND(AVG(value), 4) AS duracion_promedio_min,
             |  ROUND(AVG(value), 4) AS tarifa_promedio
             |FROM events GROUP BY event_type
             |ORDER BY total_viajes DESC, event_type""".stripMargin)
    ),

    // ---- A7/E5: CASE-chain bucketing ----------------------------------------
    QuerySpec(
      "a7_value_bins",
      (s, dir) =>
        Marts.distanceBins(Tables.events(s, dir), "value", "value", "value")
          .select(
            col("distancia_bin"),
            col("distancia_orden").cast("long").as("distancia_orden"),
            col("total_viajes"),
            round(col("distancia_promedio"), 4).as("distancia_promedio")
          )
          .orderBy(col("distancia_orden")),
      Some("""SELECT
             |  CASE WHEN value < 1 THEN '0-1' WHEN value < 3 THEN '1-3'
             |       WHEN value < 5 THEN '3-5' WHEN value < 10 THEN '5-10'
             |       WHEN value < 20 THEN '10-20' ELSE '20+' END AS distancia_bin,
             |  CAST(CASE WHEN value < 1 THEN 1 WHEN value < 3 THEN 2
             |       WHEN value < 5 THEN 3 WHEN value < 10 THEN 4
             |       WHEN value < 20 THEN 5 ELSE 6 END AS BIGINT) AS distancia_orden,
             |  COUNT(*) AS total_viajes,
             |  ROUND(AVG(value), 4) AS distancia_promedio
             |FROM events GROUP BY 1, 2 ORDER BY distancia_orden""".stripMargin)
    ),

    // ---- A8: variability (stddev + exact percentiles) -----------------------
    QuerySpec(
      "a8_variability",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        Marts.variability(e, "event_hour", "value", "value", exact = true)
          .select(
            col("event_hour").cast("long").as("event_hour"),
            col("total_viajes"),
            round(col("tarifa_promedio"), 4).as("tarifa_promedio"),
            round(col("tarifa_std"), 4).as("tarifa_std"),
            round(col("tarifa_p25"), 4).as("tarifa_p25"),
            round(col("tarifa_p50"), 4).as("tarifa_p50"),
            round(col("tarifa_p75"), 4).as("tarifa_p75")
          )
          .orderBy(col("event_hour"))
      },
      Some("""SELECT CAST(hour(ts) AS BIGINT) AS event_hour,
             |  COUNT(*) AS total_viajes,
             |  ROUND(AVG(value), 4) AS tarifa_promedio,
             |  ROUND(STDDEV_SAMP(value), 4) AS tarifa_std,
             |  ROUND(quantile_cont(value, 0.25), 4) AS tarifa_p25,
             |  ROUND(quantile_cont(value, 0.50), 4) AS tarifa_p50,
             |  ROUND(quantile_cont(value, 0.75), 4) AS tarifa_p75
             |FROM events GROUP BY 1 ORDER BY event_hour""".stripMargin)
    ),

    // ---- A9/E6-E8: error-metric mart (MAE/RMSE composition) -----------------
    QuerySpec(
      "a9_errors_by_hour",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
          .withColumn("pred", col("value"))
          .withColumn("label", lit(100.0))
        Marts.errorsByHour(e, "event_hour", "pred", "label")
          .select(
            col("event_hour").cast("long").as("event_hour"),
            col("total_viajes"),
            round(col("mae"), 4).as("mae"),
            round(col("rmse"), 4).as("rmse"),
            round(col("pred_promedio"), 4).as("pred_promedio")
          )
          .orderBy(col("event_hour"))
      },
      Some("""SELECT CAST(hour(ts) AS BIGINT) AS event_hour,
             |  COUNT(*) AS total_viajes,
             |  ROUND(AVG(ABS(value - 100.0)), 4) AS mae,
             |  ROUND(SQRT(AVG(POW(value - 100.0, 2))), 4) AS rmse,
             |  ROUND(AVG(value), 4) AS pred_promedio
             |FROM events GROUP BY 1 ORDER BY event_hour""".stripMargin)
    ),

    // ---- F3: exact-percentile outlier band filter ---------------------------
    QuerySpec(
      "f3_outlier_band",
      (s, dir) =>
        Outliers.exactBandFilter(Tables.events(s, dir), "value", 0.01, 0.99)
          .select(col("event_id"), col("value"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id, value FROM events
             |WHERE value >= (SELECT quantile_cont(value, 0.01) FROM events)
             |  AND value <= (SELECT quantile_cont(value, 0.99) FROM events)
             |ORDER BY event_id""".stripMargin)
    ),

    // ---- J1+E12: mart-join ratio --------------------------------------------
    QuerySpec(
      "j1_ratio_by_hour",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("event_hour")).agg(round(avg(col("value")), 4).as("compra_promedio"))
        val views = e.filter(col("event_type") === "view")
          .groupBy(col("event_hour")).agg(round(avg(col("value")), 4).as("vista_promedio"))
        Report.ratioByKey(purchases, views, "event_hour", "compra_promedio", "vista_promedio", "ratio")
          .select(
            col("event_hour").cast("long").as("event_hour"),
            col("compra_promedio"),
            col("vista_promedio"),
            round(col("ratio"), 6).as("ratio")
          )
          .orderBy(col("event_hour"))
      },
      Some("""WITH p AS (
             |  SELECT CAST(hour(ts) AS BIGINT) AS event_hour, ROUND(AVG(value), 4) AS compra_promedio
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |v AS (
             |  SELECT CAST(hour(ts) AS BIGINT) AS event_hour, ROUND(AVG(value), 4) AS vista_promedio
             |  FROM events WHERE event_type = 'view' GROUP BY 1)
             |SELECT p.event_hour, p.compra_promedio, v.vista_promedio,
             |  ROUND(p.compra_promedio / v.vista_promedio, 6) AS ratio
             |FROM p JOIN v USING (event_hour) ORDER BY p.event_hour""".stripMargin)
    ),

    // ---- J2: multi-table star join (broadcast dims) --------------------------
    QuerySpec(
      "j2_revenue_by_nation",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        val revenue = dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            sum(revenue).cast("double").as("revenue"),
            count(lit(1)).as("n_items")
          )
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)
    ),

    // ---- A12: weighted re-aggregation (month->year rollup algebra) ----------
    QuerySpec(
      "a12_weighted_rollup",
      (s, dir) => {
        // Cross-engine reproducibility: every cross-group accumulation is an
        // exact DECIMAL sum (order-insensitive); doubles only appear in single
        // deterministic divisions on exact inputs. See VERDICT r1 "What's wrong".
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        val perHourDow = e.groupBy(col("event_dow"), col("event_hour"))
          .agg(
            count(lit(1)).as("n"),
            round(dsum(col("value")) / count(lit(1)), 6).cast("decimal(18,6)").as("avg_dec")
          )
        Report.weightedRollup(perHourDow, Seq("event_dow"), Seq("avg_dec" -> "valor_ponderado"), "n")
          .select(
            col("event_dow").cast("long").as("event_dow"),
            col("n_groups"),
            col("n"),
            round(col("valor_ponderado"), 4).as("valor_ponderado")
          )
          .orderBy(col("event_dow"))
      },
      Some("""WITH m AS (
             |  SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS event_dow, hour(ts) AS event_hour,
             |    COUNT(*) AS n,
             |    CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS avg_dec
             |  FROM events GROUP BY 1, 2)
             |SELECT event_dow, COUNT(*) AS n_groups, CAST(SUM(n) AS BIGINT) AS n,
             |  ROUND(CAST(SUM(avg_dec * n) AS DOUBLE) / SUM(n), 4) AS valor_ponderado
             |FROM m GROUP BY event_dow ORDER BY event_dow""".stripMargin)
    ),

    // ---- A14: argmax/argmin row lookup (unique-ified metric for ties) -------
    QuerySpec(
      "a14_peak_hour",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        val perHour = e.groupBy(col("event_hour").cast("long").as("event_hour"))
          .agg(count(lit(1)).as("n"))
          .withColumn("m", col("n") * 100 + col("event_hour"))
        perHour.agg(
          expr("max_by(event_hour, m)").as("hora_pico"),
          max(col("n")).as("max_viajes"),
          expr("min_by(event_hour, m)").as("hora_valle"),
          min(col("n")).as("min_viajes")
        )
      },
      Some("""WITH h AS (
             |  SELECT CAST(hour(ts) AS BIGINT) AS event_hour, COUNT(*) AS n
             |  FROM events GROUP BY 1)
             |SELECT arg_max(event_hour, n * 100 + event_hour) AS hora_pico,
             |  MAX(n) AS max_viajes,
             |  arg_min(event_hour, n * 100 + event_hour) AS hora_valle,
             |  MIN(n) AS min_viajes
             |FROM h""".stripMargin)
    ),

    // ---- A15: cumulative demand share (window aggregate) --------------------
    QuerySpec(
      "a15_cumulative_demand",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        val perHour = e.groupBy(col("event_hour").cast("long").as("event_hour"))
          .agg(count(lit(1)).as("n"))
        Report.cumulativeShare(perHour, "event_hour", "n")
          .select(
            col("event_hour"),
            col("n"),
            col("cum"),
            round(col("cum_pct"), 6).as("cum_pct")
          )
          .orderBy(col("event_hour"))
      },
      Some("""WITH h AS (
             |  SELECT CAST(hour(ts) AS BIGINT) AS event_hour, COUNT(*) AS n
             |  FROM events GROUP BY 1)
             |SELECT event_hour, n,
             |  CAST(SUM(n) OVER (ORDER BY event_hour) AS BIGINT) AS cum,
             |  ROUND(SUM(n) OVER (ORDER BY event_hour) * CAST(100.0 AS DOUBLE) / SUM(n) OVER (), 6) AS cum_pct
             |FROM h ORDER BY event_hour""".stripMargin)
    ),

    // ---- E13: percentage of total -------------------------------------------
    QuerySpec(
      "e13_pct_of_total",
      (s, dir) => {
        val byType = Tables.events(s, dir).groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        Report.pctOfTotal(byType, "n", "pct")
          .select(col("event_type"), col("n"), round(col("pct"), 6).as("pct"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
             |  ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 6) AS pct
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // ---- E11/J3: code->label decode with fallback ----------------------------
    QuerySpec(
      "e11_decode_labels",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val labeled = e.withColumn(
          "etiqueta",
          coalesce(
            when(col("event_type") === "click", "Clic")
              .when(col("event_type") === "view", "Vista")
              .when(col("event_type") === "purchase", "Compra"),
            lit("Otro")
          )
        ).withColumn("display", concat_ws(" - ", col("event_type"), col("etiqueta")))
        labeled.groupBy(col("event_type"), col("etiqueta"), col("display"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  COALESCE(CASE WHEN event_type = 'click' THEN 'Clic'
             |                WHEN event_type = 'view' THEN 'Vista'
             |                WHEN event_type = 'purchase' THEN 'Compra' END,
             |           'Otro') AS etiqueta,
             |  event_type || ' - ' || COALESCE(CASE WHEN event_type = 'click' THEN 'Clic'
             |                WHEN event_type = 'view' THEN 'Vista'
             |                WHEN event_type = 'purchase' THEN 'Compra' END,
             |           'Otro') AS display,
             |  COUNT(*) AS n
             |FROM events GROUP BY 1, 2, 3 ORDER BY event_type""".stripMargin)
    ),

    // ---- Set op: union-by-name ------------------------------------------------
    QuerySpec(
      "set_union_by_name",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val a = e.filter(col("event_type") === "click").select(col("event_id"), col("value"))
        val b = e.filter(col("event_type") === "error").select(col("value"), col("event_id"))
        a.unionByName(b).orderBy(col("event_id"))
      },
      Some("""SELECT event_id, value FROM events WHERE event_type IN ('click', 'error')
             |ORDER BY event_id""".stripMargin)
    ),

    // ---- JSON scalar extraction (S2-family) -----------------------------------
    QuerySpec(
      "json_props_extract",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("k")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
             |FROM events GROUP BY 1 ORDER BY k""".stripMargin)
    ),

    // ---- O5-adjacent: deterministic key-mod sample ----------------------------
    QuerySpec(
      "f4_mod_sample",
      (s, dir) =>
        Tables.events(s, dir)
          .filter(pmod(col("event_id"), lit(20)) === 0)
          .select(col("event_id"), col("event_type"), col("value"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id, event_type, value FROM events
             |WHERE event_id % 20 = 0 ORDER BY event_id""".stripMargin)
    )
  )
}
