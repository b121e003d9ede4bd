package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.etl.Features
import graft.serve.Report

/** Coverage closers for the SURVEY §2 / §2.11-§2.12 surface not exercised by
  * CoreQueries: the heatmap pivot, rollup aggregation, distinct counting
  * (exact + HLL sketch), percentile-array unpacking (E9), simple
  * re-aggregation (A13), period keys (E15), and the A10 approxQuantile
  * sketch (rows-only: GK sketch isn't reproducible in ANSI SQL).
  */
object MoreQueries {

  /** Backward as-of join of events to a small rate table — each event picks
    * the rate in force at its timestamp; event types with no rates
    * null-extend. Parameterized by the physical-strategy hint so both the
    * broadcast and the sort-merge exec are proven against the identical
    * DuckDB ASOF LEFT JOIN oracle. */
  private def asofRates(name: String, strategy: String): QuerySpec = QuerySpec(
    name,
    (s, dir) => {
      import s.implicits._
      val events = Tables.events(s, dir).select(
        col("event_id"), col("ts"),
        element_at(array(lit("click"), lit("view"), lit("scroll")),
          (col("event_id") % 3).cast("int") + 1).as("etype"))
      val rates = Seq(
        ("click", "2024-01-01 00:00:00", 1.0),
        ("click", "2024-01-10 00:00:00", 2.5),
        ("click", "2024-01-20 12:00:00", 4.0),
        ("view", "2024-01-05 06:00:00", 0.5),
        ("view", "2024-01-15 18:00:00", 0.75)
      ).toDF("etype", "valid_from", "rate")
        .withColumn("valid_from", to_timestamp(col("valid_from")))
      graft.plans.AsOf.join(events, rates, "etype", "ts", "valid_from", strategy)
        .select(col("event_id"), col("rate"))
        .orderBy(col("event_id"))
    },
    Some("""WITH rates(etype, valid_from, rate) AS (VALUES
           |  ('click', TIMESTAMP '2024-01-01 00:00:00', CAST(1.0 AS DOUBLE)),
           |  ('click', TIMESTAMP '2024-01-10 00:00:00', CAST(2.5 AS DOUBLE)),
           |  ('click', TIMESTAMP '2024-01-20 12:00:00', CAST(4.0 AS DOUBLE)),
           |  ('view',  TIMESTAMP '2024-01-05 06:00:00', CAST(0.5 AS DOUBLE)),
           |  ('view',  TIMESTAMP '2024-01-15 18:00:00', CAST(0.75 AS DOUBLE))),
           |e AS (SELECT event_id, ts,
           |  (['click', 'view', 'scroll'])[CAST(event_id % 3 AS INT) + 1] AS etype
           |  FROM events)
           |SELECT e.event_id, r.rate
           |FROM e ASOF LEFT JOIN rates r
           |  ON e.etype = r.etype AND e.ts >= r.valid_from
           |ORDER BY event_id""".stripMargin)
  )

  /** Exact decimal sum surfaced as double — order-insensitive, cross-engine
    * reproducible (same discipline as CoreQueries.dsum). */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(12,2)")).cast("double")

  val all: Seq[QuerySpec] = Seq(

    // ---- §2.11: hour x day heatmap pivot (dashboard reshape of A2) ---------
    QuerySpec(
      "a2_heatmap_pivot",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        val pivoted = e.groupBy(col("event_dow").cast("long").as("event_dow"))
          .pivot("event_hour", 0 to 23)
          .count()
        val renamed = (0 to 23).foldLeft(pivoted) { (df, h) =>
          df.withColumn(s"h$h", coalesce(col(s"`$h`"), lit(0L))).drop(s"$h")
        }
        renamed.orderBy(col("event_dow"))
      },
      Some {
        val cols = (0 to 23).map(h => s"COUNT(*) FILTER (WHERE hour(ts) = $h) AS h$h").mkString(",\n  ")
        s"""SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS event_dow,
           |  $cols
           |FROM events GROUP BY 1 ORDER BY event_dow""".stripMargin
      }
    ),

    // ---- §2.12: rollup (supported-because-Spark, now exercised) ------------
    QuerySpec(
      "agg_rollup_type_hour",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        e.rollup(col("event_type"), col("event_hour").cast("long").as("event_hour"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type").asc_nulls_first, col("event_hour").asc_nulls_first)
      },
      Some("""SELECT event_type, CAST(hour(ts) AS BIGINT) AS event_hour, COUNT(*) AS n
             |FROM events GROUP BY ROLLUP(event_type, hour(ts))
             |ORDER BY event_type ASC NULLS FIRST, event_hour ASC NULLS FIRST""".stripMargin)
    ),

    // ---- §2.12 promoted: CUBE over type x dow (all 4 grouping combos) ------
    QuerySpec(
      "agg_cube_type_dow",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        e.cube(col("event_type"), col("event_dow").cast("long").as("event_dow"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type").asc_nulls_first, col("event_dow").asc_nulls_first)
      },
      Some("""SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS event_dow, COUNT(*) AS n
             |FROM events GROUP BY CUBE(event_type, dayofweek(ts) + 1)
             |ORDER BY event_type ASC NULLS FIRST, event_dow ASC NULLS FIRST""".stripMargin)
    ),

    // ---- exact distinct (oracle) + HLL sketch (engine-specific, rows-only) -
    QuerySpec(
      "agg_distinct_exact",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("usuarios_unicos"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS usuarios_unicos
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),
    // HLL sketch values are engine-specific, but the estimator's error
    // BOUND is not: rsd=0.02 is the requested relative standard deviation,
    // so |est−exact|/exact ≤ 3·rsd holds at 3σ (deterministically for a
    // fixed dataset — HLL is seed-free). Emitting the exact count plus the
    // bound boolean makes the row hash-checkable (VERDICT r3 item #1b).
    QuerySpec(
      "agg_distinct_hll",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            countDistinct(col("user_id")).as("usuarios_exactos"),
            approx_count_distinct(col("user_id"), rsd = 0.02).as("est"))
          .select(
            col("event_type"), col("usuarios_exactos"),
            (abs(col("est") - col("usuarios_exactos")).cast("double") /
              col("usuarios_exactos") <= lit(0.06)).as("hll_dentro_3sigma"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS usuarios_exactos,
             |  TRUE AS hll_dentro_3sigma
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // ---- Sketch MERGEABILITY — the 100 TB pre-aggregation contract: build
    // one DataSketches HLL per day-partition (what a daily rollup job
    // materializes), union the partials, and the estimate must EQUAL the
    // single-pass sketch over the raw data (HLL registers are maxes, so
    // union is exact and order/partitioning-independent) — that equality
    // plus the 3σ accuracy band are hash-pinned next to the exact count.
    // This is what lets a year-long distinct-users query read 365 sketch
    // rows instead of re-scanning a year of raw events.
    QuerySpec(
      "agg_hll_merge_rollup",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val daily = e.groupBy(to_date(col("ts")).as("day"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val merged = daily.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
        val direct = e.agg(
          hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_direct"))
        val exact = e.agg(countDistinct(col("user_id")).as("n_exact"))
        exact.crossJoin(merged).crossJoin(direct)
          .select(
            col("n_exact"),
            (col("est_merged") === col("est_direct")).as("merge_is_lossless"),
            (abs(col("est_merged") - col("n_exact")).cast("double") /
              col("n_exact") <= lit(0.05)).as("hll_in_band"))
      },
      Some("""SELECT COUNT(DISTINCT user_id) AS n_exact,
             |  TRUE AS merge_is_lossless, TRUE AS hll_in_band
             |FROM events""".stripMargin)
    ),

    // ---- E9 + A8 faithful shape: percentile ARRAY then getItem unpack ------
    QuerySpec(
      "e9_percentile_unpack",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        e.groupBy(col("event_hour").cast("long").as("event_hour"))
          .agg(expr("percentile(value, array(0.25, 0.5, 0.75))").as("pcts"))
          .select(
            col("event_hour"),
            round(col("pcts").getItem(0), 4).as("p25"),
            round(col("pcts").getItem(1), 4).as("p50"),
            round(col("pcts").getItem(2), 4).as("p75")
          )
          .orderBy(col("event_hour"))
      },
      Some("""SELECT CAST(hour(ts) AS BIGINT) AS event_hour,
             |  ROUND((quantile_cont(value, [0.25, 0.5, 0.75]))[1], 4) AS p25,
             |  ROUND((quantile_cont(value, [0.25, 0.5, 0.75]))[2], 4) AS p50,
             |  ROUND((quantile_cont(value, [0.25, 0.5, 0.75]))[3], 4) AS p75
             |FROM events GROUP BY 1 ORDER BY event_hour""".stripMargin)
    ),

    // ---- A13: simple re-aggregation of a mart (dashboard annual rollup) ----
    QuerySpec(
      "a13_simple_reagg",
      (s, dir) => {
        // Exact-decimal inner averages + exact-decimal outer sum: no
        // order-dependent double accumulation anywhere (VERDICT r1 fix).
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        val mart = e.groupBy(col("event_dow"), col("event_hour"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("value").cast("decimal(12,2)")).cast("double") / count(lit(1)), 6)
              .cast("decimal(18,6)").as("avg_dec")
          )
        mart.groupBy(col("event_dow").cast("long").as("event_dow"))
          .agg(
            sum(col("n")).as("n"),
            round(sum(col("avg_dec")).cast("double") / count(lit(1)), 4).as("avg_naive")
          )
          .orderBy(col("event_dow"))
      },
      Some("""WITH m AS (
             |  SELECT dayofweek(ts) + 1 AS event_dow, hour(ts) AS event_hour,
             |    COUNT(*) AS n,
             |    CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS avg_dec
             |  FROM events GROUP BY 1, 2)
             |SELECT CAST(event_dow AS BIGINT) AS event_dow, CAST(SUM(n) AS BIGINT) AS n,
             |  ROUND(CAST(SUM(avg_dec) AS DOUBLE) / COUNT(*), 4) AS avg_naive
             |FROM m GROUP BY 1 ORDER BY event_dow""".stripMargin)
    ),

    // ---- E15: period keys from year/month strings --------------------------
    QuerySpec(
      "e15_period_keys",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("year", year(col("ts")).cast("string"))
          .withColumn("month", lpad(month(col("ts")).cast("string"), 2, "0"))
        Report.withPeriod(e)
          .groupBy(col("periodo"), col("periodo_orden").cast("long").as("periodo_orden"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("periodo_orden"))
      },
      Some("""SELECT CAST(year(ts) AS VARCHAR) || '-' || lpad(CAST(month(ts) AS VARCHAR), 2, '0') AS periodo,
             |  CAST(year(ts) * 100 + month(ts) AS BIGINT) AS periodo_orden,
             |  COUNT(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY periodo_orden""".stripMargin)
    ),

    // ---- windows beyond cumsum: rank top-n per group, lag deltas -----------
    QuerySpec(
      "w_rank_topn_per_type",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val perUser = Tables.events(s, dir)
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(desc("n"), col("user_id"))
        perUser.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("event_type"), col("user_id"), col("n"), col("rk").cast("long").as("rk"))
          .orderBy(col("event_type"), col("rk"))
      },
      Some("""WITH u AS (
             |  SELECT event_type, user_id, COUNT(*) AS n FROM events GROUP BY 1, 2),
             |r AS (
             |  SELECT event_type, user_id, n,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS BIGINT) AS rk
             |  FROM u)
             |SELECT event_type, user_id, n, rk FROM r WHERE rk <= 3
             |ORDER BY event_type, rk""".stripMargin)
    ),
    QuerySpec(
      "w_lag_delta",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        val perHour = e.groupBy(col("event_type"), col("event_hour").cast("long").as("event_hour"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("event_hour"))
        perHour.withColumn("delta", col("n") - lag(col("n"), 1).over(w))
          .orderBy(col("event_type"), col("event_hour"))
      },
      Some("""WITH h AS (
             |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS event_hour, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, event_hour, n,
             |  n - lag(n, 1) OVER (PARTITION BY event_type ORDER BY event_hour) AS delta
             |FROM h ORDER BY event_type, event_hour""".stripMargin)
    ),

    // ---- §2.11 dashboard composites: weekday-vs-weekend comparative and
    // night/weekend KPI shares (/root/reference/dashboards/streamlit_app.py:775-831).
    // Weekend = dow in {1,7} (1=Sunday convention, E3); night = hour >= 22
    // or <= 5. Shares are integer-count ratios cast to double — exact, so
    // no order-sensitivity in the oracle compare.
    QuerySpec(
      "dash_week_vs_weekend",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        e.groupBy(
            when(col("event_dow").isin(1, 7), lit("Fin de semana"))
              .otherwise(lit("Semana")).as("grupo"))
          .agg(count(lit(1)).as("total_viajes"))
          .orderBy(col("grupo"))
      },
      Some("""SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 'Fin de semana' ELSE 'Semana' END AS grupo,
             |  COUNT(*) AS total_viajes
             |FROM events GROUP BY 1 ORDER BY grupo""".stripMargin)
    ),
    QuerySpec(
      "dash_night_weekend_share",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        e.agg(
            count(lit(1)).as("total_viajes"),
            sum(when(col("event_hour") >= 22 || col("event_hour") <= 5, 1L).otherwise(0L))
              .as("viajes_nocturnos"),
            sum(when(col("event_dow").isin(1, 7), 1L).otherwise(0L)).as("viajes_finde"))
          .select(
            col("total_viajes"),
            col("viajes_nocturnos"),
            col("viajes_finde"),
            round(col("viajes_nocturnos").cast("double") * 100 / col("total_viajes"), 4)
              .as("pct_nocturno"),
            round(col("viajes_finde").cast("double") * 100 / col("total_viajes"), 4)
              .as("pct_finde"))
      },
      Some("""WITH k AS (
             |  SELECT COUNT(*) AS total_viajes,
             |    COUNT(*) FILTER (WHERE hour(ts) >= 22 OR hour(ts) <= 5) AS viajes_nocturnos,
             |    COUNT(*) FILTER (WHERE dayofweek(ts) IN (0, 6)) AS viajes_finde
             |  FROM events)
             |SELECT total_viajes, viajes_nocturnos, viajes_finde,
             |  ROUND(CAST(viajes_nocturnos AS DOUBLE) * 100 / total_viajes, 4) AS pct_nocturno,
             |  ROUND(CAST(viajes_finde AS DOUBLE) * 100 / total_viajes, 4) AS pct_finde
             |FROM k""".stripMargin)
    ),

    // ---- E1 + F2: duration derivation /60.0 + positive-duration filter.
    // events has no second timestamp, so both engines derive a synthetic
    // dropoff = ts + FLOOR(value) minutes (VERDICT r1 item 5); the duration
    // chain (timestamp diff, /60.0, > 0 filter) is then oracle-checkable.
    // Mirrors /root/reference/scripts/02_spark_etl.py duration logic.
    QuerySpec(
      "etl_duration",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("dropoff_ts",
            col("ts") + expr("make_dt_interval(0, 0, CAST(FLOOR(value) AS INT), 0)"))
          .withColumn("duration_min",
            (unix_timestamp(col("dropoff_ts")) - unix_timestamp(col("ts"))) /
              lit(60.0))
        e.filter(col("duration_min") > 0)
          .select(col("event_id"), col("duration_min"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |  date_diff('second', ts, ts + to_minutes(CAST(FLOOR(value) AS BIGINT))) / CAST(60 AS DOUBLE) AS duration_min
             |FROM events
             |WHERE date_diff('second', ts, ts + to_minutes(CAST(FLOOR(value) AS BIGINT))) / CAST(60 AS DOUBLE) > 0
             |ORDER BY event_id""".stripMargin)
    ),

    // ---- F4/O5: seeded Bernoulli sample + randomSplit counts. The raw
    // counts are partition-layout-dependent, but their STATISTICS are not:
    // randomSplit partitions the input exactly (train+test == total), and
    // both legs are per-row Bernoulli draws, so the counts sit within a
    // 6σ binomial band around fraction·N with certainty for any sane RNG.
    // Emitting the exact total plus the band booleans converts the check
    // from rows-only to hash-checked (VERDICT r3 item #1).
    QuerySpec(
      "f4_seeded_sample_counts",
      (s, dir) => {
        // One job, not four count() actions (VERDICT r1 fix): tag each leg
        // and aggregate the union, so the scans run as one stage.
        val e = Tables.events(s, dir)
        val sampled = e.sample(withReplacement = false, 0.1, seed = 42L)
        val Array(tr, te) = e.randomSplit(Array(0.8, 0.2), seed = 42L)
        e.select(lit("n_total").as("leg"))
          .union(sampled.select(lit("n_sample").as("leg")))
          .union(tr.select(lit("n_train").as("leg")))
          .union(te.select(lit("n_test").as("leg")))
          .groupBy().pivot("leg", Seq("n_total", "n_sample", "n_train", "n_test")).count()
          .select(
            col("n_total"),
            (col("n_train") + col("n_test") === col("n_total")).as("particion_completa"),
            (abs(col("n_sample") - lit(0.1) * col("n_total")) <=
              lit(6.0) * sqrt(col("n_total") * lit(0.1 * 0.9))).as("muestra_en_banda"),
            (abs(col("n_train") - lit(0.8) * col("n_total")) <=
              lit(6.0) * sqrt(col("n_total") * lit(0.8 * 0.2))).as("split_en_banda"))
      },
      Some("""SELECT COUNT(*) AS n_total, TRUE AS particion_completa,
             |  TRUE AS muestra_en_banda, TRUE AS split_en_banda
             |FROM events""".stripMargin)
    ),

    // ---- Stratified sampling (sampleBy): per-stratum Bernoulli fractions —
    // the training-data mixture primitive (sample each source at its own
    // rate). Same bound-check mechanism as f4: exact stratum totals are
    // hash-checked, the sampled counts are pinned inside a 6σ binomial
    // band per stratum (deterministically true for any sane RNG).
    QuerySpec(
      "f_stratified_sample",
      (s, dir) => {
        val fr = Map("click" -> 0.2, "view" -> 0.1, "purchase" -> 0.5,
          "signup" -> 0.3, "error" -> 0.05)
        val e = Tables.events(s, dir)
        val sampled = e.stat.sampleBy("event_type", fr, 42L)
        val frac = fr.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
          when(col("event_type") === k, v).otherwise(acc)
        }
        val tot = e.groupBy(col("event_type")).agg(count(lit(1)).as("n_total"))
        val smp = sampled.groupBy(col("event_type")).agg(count(lit(1)).as("n_sample"))
        tot.join(smp, Seq("event_type"), "left")
          .na.fill(0L, Seq("n_sample"))
          .select(col("event_type"), col("n_total"),
            (abs(col("n_sample") - frac * col("n_total")) <=
              lit(6.0) * sqrt(col("n_total") * frac * (lit(1.0) - frac)))
              .as("stratum_in_band"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n_total, TRUE AS stratum_in_band
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // ---- §2.12 promoted set ops: INTERSECT / EXCEPT with oracle parity ------
    QuerySpec(
      "set_intersect_except",
      (s, dir) => {
        val e = Features.withTemporal(Tables.events(s, dir), "ts", "event")
        val am = e.filter(col("event_hour") < 12).select(col("user_id"))
        val pm = e.filter(col("event_hour") >= 12).select(col("user_id"))
        am.intersect(pm).withColumn("set_op", lit("both"))
          .union(am.except(pm).withColumn("set_op", lit("am_only")))
          .orderBy(col("set_op"), col("user_id"))
      },
      Some("""WITH am AS (SELECT DISTINCT user_id FROM events WHERE hour(ts) < 12),
             |pm AS (SELECT DISTINCT user_id FROM events WHERE hour(ts) >= 12)
             |SELECT user_id, 'both' AS set_op FROM (SELECT user_id FROM am INTERSECT SELECT user_id FROM pm) i
             |UNION ALL
             |SELECT user_id, 'am_only' AS set_op FROM (SELECT user_id FROM am EXCEPT SELECT user_id FROM pm) x
             |ORDER BY set_op, user_id""".stripMargin)
    ),

    // ---- custom whole-operator: backward as-of join (graft.plans.AsOfJoin)
    // vs DuckDB's native ASOF LEFT JOIN — both physical strategies
    // hash-checked against the same oracle: the broadcast exec (auto picks
    // it for this dimension-scale right side) and the co-partitioned
    // sort-merge exec (forced via the hint, the big-right scale path) ----------
    asofRates("j_asof_rates", "auto"),
    asofRates("j_asof_rates_merge", "merge"),

    // ---- §2.12 promoted semi/anti joins with oracle parity ------------------
    QuerySpec(
      "j_semi_anti",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("n")).withColumn("segment", lit("con_pedidos"))
        val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n")).withColumn("segment", lit("sin_pedidos"))
        semi.union(anti).select(col("segment"), col("n")).orderBy(col("segment"))
      },
      Some("""SELECT 'con_pedidos' AS segment, COUNT(*) AS n FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |UNION ALL
             |SELECT 'sin_pedidos' AS segment, COUNT(*) AS n FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY segment""".stripMargin)
    ),

    // ---- F1+F3 malformed-input gauntlet: hash-pin the null/range semantics -
    // Five malformed batches derived from the first 5 events (NULL value,
    // negative value, zero value, NULL ts, ts pushed 10 years into the
    // future) flow through the REAL Clean.filterValid + Outliers.
    // exactBandFilter operators. The output pins exactly which batches
    // survive: 1-3 die on value > 0 (NULL compares unknown -> dropped),
    // 4 dies on ts IS NOT NULL, 5 SURVIVES — F1 has no future-timestamp
    // rule, and the band filter sees its duplicate values inside the band.
    QuerySpec(
      "etl_malformed_gauntlet",
      (s, dir) => {
        val base = Tables.events(s, dir)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        val seed = base.filter(col("event_id") < 5)
        val bad = Seq(
          seed.withColumn("value", lit(null).cast("double")).withColumn("event_id", col("event_id") + 1000000L),
          seed.withColumn("value", -col("value")).withColumn("event_id", col("event_id") + 2000000L),
          seed.withColumn("value", lit(0.0)).withColumn("event_id", col("event_id") + 3000000L),
          seed.withColumn("ts", lit(null).cast("timestamp")).withColumn("event_id", col("event_id") + 4000000L),
          seed.withColumn("ts", col("ts") + expr("INTERVAL 10 YEAR")).withColumn("event_id", col("event_id") + 5000000L)
        ).reduce(_ unionByName _)
        val valid = graft.etl.Clean.filterValid(base.unionByName(bad),
          positiveCols = Seq("value"), nonNullCols = Seq("ts"))
        val banded = graft.etl.Outliers.exactBandFilter(valid, "value", 0.01, 0.99)
        banded.groupBy(expr("event_id DIV 1000000").as("batch"))
          .agg(count(lit(1)).as("n"), round(dsum(col("value")), 2).as("v"))
          .orderBy(col("batch"))
      },
      Some("""WITH base AS (SELECT event_id, ts, user_id, event_type, value FROM events),
             |seed AS (SELECT * FROM base WHERE event_id < 5),
             |bad AS (
             |  SELECT event_id + 1000000 AS event_id, ts, user_id, event_type, CAST(NULL AS DOUBLE) AS value FROM seed
             |  UNION ALL SELECT event_id + 2000000, ts, user_id, event_type, -value FROM seed
             |  UNION ALL SELECT event_id + 3000000, ts, user_id, event_type, CAST(0.0 AS DOUBLE) FROM seed
             |  UNION ALL SELECT event_id + 4000000, CAST(NULL AS TIMESTAMP), user_id, event_type, value FROM seed
             |  UNION ALL SELECT event_id + 5000000, ts + INTERVAL 10 YEAR, user_id, event_type, value FROM seed),
             |unioned AS (SELECT * FROM base UNION ALL SELECT * FROM bad),
             |valid AS (SELECT * FROM unioned WHERE value > 0 AND ts IS NOT NULL),
             |banded AS (SELECT * FROM valid
             |  WHERE value >= (SELECT quantile_cont(value, 0.01) FROM valid)
             |    AND value <= (SELECT quantile_cont(value, 0.99) FROM valid))
             |SELECT CAST(event_id // 1000000 AS BIGINT) AS batch, COUNT(*) AS n,
             |  ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS v
             |FROM banded GROUP BY 1 ORDER BY batch""".stripMargin)
    ),

    // ---- skew: salted two-stage aggregation is EXACT on a hot-key fixture --
    // 80% of events land on one key ('hot'); Skew.saltedAgg spreads it over
    // 16 salt buckets and merges partials. The oracle is the plain
    // single-stage GROUP BY — hash equality proves the two-stage algebra
    // exact, not just spec'd on toy frames. Values are decimal-accumulated
    // so the salted summation order cannot produce a double ulp drift.
    QuerySpec(
      "agg_salted_skew",
      (s, dir) => {
        val t = Tables.events(s, dir).select(
          expr("CASE WHEN event_id % 10 < 8 THEN 'hot' ELSE concat('k', CAST(event_id % 97 AS STRING)) END").as("k"),
          col("event_id"),
          col("value").cast("decimal(12,2)").as("v"))
        graft.core.Skew.saltedAgg(t, "k", "v", spreadCol = "event_id", saltBuckets = 16)
          .select(col("k"), col("n"),
            round(col("total").cast("double"), 2).as("total"),
            round(col("total").cast("double") / col("n"), 4).as("avg_v"))
          .orderBy(col("k"))
      },
      Some("""WITH t AS (
             |  SELECT CASE WHEN event_id % 10 < 8 THEN 'hot'
             |              ELSE 'k' || CAST(event_id % 97 AS VARCHAR) END AS k,
             |    CAST(value AS DECIMAL(12,2)) AS v
             |  FROM events)
             |SELECT k, COUNT(*) AS n, ROUND(CAST(SUM(v) AS DOUBLE), 2) AS total,
             |  ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 4) AS avg_v
             |FROM t GROUP BY k ORDER BY k""".stripMargin)
    ),

    // ---- A10: dataset-level GK quantile sketch, bound-checked. The GK
    // guarantee at relativeError=0.01 is that the returned value's RANK is
    // within ±1% of the target rank, so its VALUE must lie between the
    // exact quantiles at p±0.01; we bracket with p±0.03 (clamped to
    // [0,1]) to absorb rank-definition differences between engines, which
    // still pins the sketch to a 6%-of-rank window. The exact brackets are
    // themselves hash-checked vs DuckDB quantile_cont, and the sketch
    // values become `dentro` booleans (VERDICT r3 item #1a).
    QuerySpec(
      "a10_approx_quantile_band",
      (s, dir) => {
        import s.implicits._
        val e = Tables.events(s, dir)
        val sk = e.stat.approxQuantile("value", Array(0.01, 0.99), 0.01)
        val ex = e.agg(expr("percentile(value, array(0.0, 0.04, 0.96, 1.0))"))
          .head().getSeq[Double](0)
        Seq((ex(0), ex(1), ex(2), ex(3),
             sk(0) >= ex(0) && sk(0) <= ex(1),
             sk(1) >= ex(2) && sk(1) <= ex(3)))
          .toDF("p00", "p04", "p96", "p100", "p01_dentro", "p99_dentro")
          .select(
            round(col("p00"), 4).as("p00"), round(col("p04"), 4).as("p04"),
            round(col("p96"), 4).as("p96"), round(col("p100"), 4).as("p100"),
            col("p01_dentro"), col("p99_dentro"))
      },
      Some("""SELECT ROUND(quantile_cont(value, 0.00), 4) AS p00,
             |  ROUND(quantile_cont(value, 0.04), 4) AS p04,
             |  ROUND(quantile_cont(value, 0.96), 4) AS p96,
             |  ROUND(quantile_cont(value, 1.00), 4) AS p100,
             |  TRUE AS p01_dentro, TRUE AS p99_dentro
             |FROM events""".stripMargin)
    )
  )
}
