package graft.queries

import org.apache.spark.sql.{Column, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Dumps, Tables}
import graft.jobs.{Incremental, Merge}

/** Warehouse-maintenance operators: SCD2 dimension build, event-time
  * range-frame rolling aggregates, bivariate statistics, and unpivot.
  *
  * Scale notes (the 100 TB shapes):
  *   - scd2_user_type runs two window passes over the SAME hash partitioning
  *     (user_id) — one Exchange total; the run-compression filter between
  *     them only re-sorts within partitions.
  *   - w_rolling_time_range is a RANGE frame over epoch micros — Spark's
  *     window operator keeps a sliding buffer per partition, never the whole
  *     frame; skew only if one user dominates (then: Skew.saltedAgg).
  *   - rolling sums are DECIMAL-exact inside the frame; only the final
  *     surfacing casts to double (per the QuerySpec contract).
  */
object WarehouseQueries {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  def all: Seq[QuerySpec] = Seq(

    // ---- SCD2 (type-2 slowly-changing dimension) build from an event log:
    // run-compress consecutive equal values per user, then derive
    // [valid_from, valid_to) intervals with lead(); open intervals flagged
    // current. The standard warehouse dimension-versioning operator.
    QuerySpec(
      "scd2_user_type",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val chg = e
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .where(col("prev").isNull || col("prev") =!= col("event_type"))
        chg
          .select(col("user_id"), col("event_type"),
            col("us").as("valid_from_us"),
            lead(col("us"), 1).over(w).as("valid_to_us"))
          .withColumn("is_current",
            when(col("valid_to_us").isNull, 1L).otherwise(0L))
          .orderBy(col("user_id"), col("valid_from_us"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events),
             |chg AS (SELECT user_id, ts, event_id, event_type FROM o
             |        WHERE prev IS NULL OR prev <> event_type),
             |v AS (SELECT user_id, event_type, epoch_us(ts) AS valid_from_us,
             |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
             |  FROM chg)
             |SELECT user_id, event_type, valid_from_us, valid_to_us,
             |  CASE WHEN valid_to_us IS NULL THEN CAST(1 AS BIGINT)
             |       ELSE CAST(0 AS BIGINT) END AS is_current
             |FROM v ORDER BY user_id, valid_from_us""".stripMargin)
    ),

    // ---- Event-time rolling aggregates: RANGE frame of 1h of epoch micros
    // per user (peers with equal order keys enter the frame together on
    // both engines). Decimal-exact rolling sum.
    QuerySpec(
      "w_rolling_time_range",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("value"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-3600000000L, Window.currentRow)
        e.select(col("user_id"), col("event_id"), col("us"),
            count(lit(1)).over(w).as("n_1h"),
            sum(dec(col("value"))).over(w).cast("double").as("sum_1h"))
          .orderBy(col("user_id"), col("us"), col("event_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events)
             |SELECT user_id, event_id, us,
             |  COUNT(*) OVER w AS n_1h,
             |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_1h
             |FROM e
             |WINDOW w AS (PARTITION BY user_id ORDER BY us
             |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, us, event_id""".stripMargin)
    ),

    // ---- Bivariate statistics family: corr / covar_samp / var_samp /
    // regr_slope per type, rounded 4 per the determinism contract.
    QuerySpec(
      "agg_corr_stats",
      (s, dir) => {
        val h = hour(col("ts")).cast("double")
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            round(corr(col("value"), h), 4).as("corr_vh"),
            round(covar_samp(col("value"), h), 4).as("covar_vh"),
            round(var_samp(col("value")), 4).as("var_v"),
            round(regr_slope(col("value"), h), 4).as("slope_vh"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  ROUND(corr(value, CAST(hour(ts) AS DOUBLE)), 4) AS corr_vh,
             |  ROUND(covar_samp(value, CAST(hour(ts) AS DOUBLE)), 4) AS covar_vh,
             |  ROUND(var_samp(value), 4) AS var_v,
             |  ROUND(regr_slope(value, CAST(hour(ts) AS DOUBLE)), 4) AS slope_vh
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // ---- Unpivot (wide KPI row -> long metric/value pairs) via the native
    // DataFrame unpivot operator; the oracle's UNION ALL is the relational
    // definition it must match.
    QuerySpec(
      "unpivot_kpis",
      (s, dir) => {
        val kpi = Tables.events(s, dir).agg(
          count(lit(1)).cast("double").as("n_events"),
          dsum(col("value")).as("total_value"),
          (dsum(col("value")) / count(lit(1))).cast("double").as("avg_value"))
        kpi.unpivot(
            Array.empty[Column],
            Array(col("n_events"), col("total_value"), col("avg_value")),
            "metric", "value")
          .orderBy(col("metric"))
      },
      Some("""WITH k AS (SELECT
             |    CAST(COUNT(*) AS DOUBLE) AS n_events,
             |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
             |    CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_value
             |  FROM events)
             |SELECT 'n_events' AS metric, n_events AS value FROM k
             |UNION ALL SELECT 'total_value', total_value FROM k
             |UNION ALL SELECT 'avg_value', avg_value FROM k
             |ORDER BY metric""".stripMargin)
    ),

    // ---- SCD2 point-in-time join — THE warehouse read pattern the SCD2
    // build exists for: give every fact event the dimension version that
    // was valid at its timestamp. Planned as an equi-join on user_id with
    // the interval bounds as post-join filters (never a nested loop); at
    // 100 TB both sides co-partition on user_id. The hash pins exact
    // interval semantics: half-open [from, to), NULL-open current rows —
    // one version per event, no duplicates, no gaps.
    QuerySpec(
      "j_scd2_pointintime",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), unix_micros(col("ts")).as("us"))
        val chg = e
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .where(col("prev").isNull || col("prev") =!= col("event_type"))
        val dim = chg.select(col("user_id").as("d_user"),
          col("us").as("valid_from_us"),
          lead(col("us"), 1).over(w).as("valid_to_us"),
          row_number().over(w).as("version"))
        val fact = e.select(col("user_id"), col("event_id"), col("us"))
        fact.join(dim,
            fact("user_id") === dim("d_user") &&
              fact("us") >= dim("valid_from_us") &&
              (dim("valid_to_us").isNull || fact("us") < dim("valid_to_us")))
          .groupBy(col("version").cast("bigint").as("version"))
          .agg(count(lit(1)).as("n"),
            sum(col("event_id")).cast("bigint").as("id_sum"))
          .orderBy(col("version"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events),
             |chg AS (SELECT user_id, ts, event_id, event_type FROM o
             |        WHERE prev IS NULL OR prev <> event_type),
             |v AS (SELECT user_id, epoch_us(ts) AS valid_from_us,
             |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us,
             |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
             |  FROM chg)
             |SELECT CAST(v.version AS BIGINT) AS version, COUNT(*) AS n,
             |  CAST(SUM(e.event_id) AS BIGINT) AS id_sum
             |FROM events e JOIN v ON e.user_id = v.user_id
             |  AND epoch_us(e.ts) >= v.valid_from_us
             |  AND (v.valid_to_us IS NULL OR epoch_us(e.ts) < v.valid_to_us)
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // ---- Data-quality expectations as a first-class query: the whole
    // report is ONE conditional-aggregate pass (etl/Quality) — no
    // per-check scans. The oracle recomputes every boolean from scratch,
    // so a broken check (wrong null handling, wrong range edge) flips the
    // hash even when the data happens to be clean.
    QuerySpec(
      "dq_expectations",
      (s, dir) =>
        graft.etl.Quality.report(Tables.events(s, dir), Seq(
          graft.etl.Quality.NotNull("user_id"),
          graft.etl.Quality.NotNull("event_type"),
          graft.etl.Quality.Unique("event_id"),
          graft.etl.Quality.InRange("value", 0.0, 1000000.0),
          graft.etl.Quality.Holds("ts_in_range",
            col("ts") >= lit("2024-01-01").cast("timestamp")))),
      Some("""SELECT COUNT(*) AS n_rows,
             |  (SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) / COUNT(*)) <= 0.0 AS "not_null:user_id",
             |  (SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) / COUNT(*)) <= 0.0 AS "not_null:event_type",
             |  COUNT(event_id) = COUNT(DISTINCT event_id) AS "unique:event_id",
             |  SUM(CASE WHEN value < 0.0 OR value > 1000000.0 THEN 1 ELSE 0 END) = 0 AS "in_range:value",
             |  SUM(CASE WHEN ts >= TIMESTAMP '2024-01-01' THEN 0 ELSE 1 END) = 0 AS "holds:ts_in_range"
             |FROM events""".stripMargin)
    ),

    // ---- Cohort retention — the product-analytics staple: assign every
    // user to the cohort of their first-active day, then count distinct
    // users active at each day-offset from their cohort. Two shuffles
    // total (user-grain first-seen, then the cohort×offset rollup); the
    // cohort join broadcasts at dim scale and shuffle-joins at 100 TB —
    // either way it is an equi-join on user_id.
    QuerySpec(
      "cohort_retention",
      (s, dir) => {
        val day = expr("unix_micros(ts) DIV 86400000000")
        val act = Tables.events(s, dir)
          .select(col("user_id"), day.as("day")).distinct()
        val first = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
        act.join(first, Seq("user_id"))
          .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy(col("cohort_day"), col("offset_days"))
      },
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
             |first AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1)
             |SELECT f.cohort_day, a.day - f.cohort_day AS offset_days,
             |  COUNT(DISTINCT a.user_id) AS n_active
             |FROM act a JOIN first f ON a.user_id = f.user_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // ---- Ordered funnel — strictly-sequential step matching: first view,
    // then the first click AFTER it, then the first purchase AFTER that.
    // Each stage is a per-user MIN over a time-bounded equi-join with the
    // previous stage (never a cross join); emitting per-stage user counts
    // plus decimal-exact conversion ratios.
    QuerySpec(
      "funnel_steps",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        val v = e.where(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
        val c = e.where(col("event_type") === "click")
          .join(v, Seq("user_id")).where(col("us") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
        val p = e.where(col("event_type") === "purchase")
          .join(c, Seq("user_id")).where(col("us") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(c.agg(count(lit(1)).as("n_click")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
          .select(col("n_view"), col("n_click"), col("n_purchase"),
            round(col("n_click").cast("double") / col("n_view"), 4).as("view_to_click"),
            round(col("n_purchase").cast("double") / col("n_click"), 4).as("click_to_purchase"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
             |v AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, MIN(e.us) AS t2 FROM e JOIN v ON e.user_id = v.user_id
             |      WHERE e.event_type = 'click' AND e.us > v.t1 GROUP BY 1),
             |p AS (SELECT e.user_id, MIN(e.us) AS t3 FROM e JOIN c ON e.user_id = c.user_id
             |      WHERE e.event_type = 'purchase' AND e.us > c.t2 GROUP BY 1)
             |SELECT (SELECT COUNT(*) FROM v) AS n_view,
             |  (SELECT COUNT(*) FROM c) AS n_click,
             |  (SELECT COUNT(*) FROM p) AS n_purchase,
             |  ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE) / (SELECT COUNT(*) FROM v), 4) AS view_to_click,
             |  ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE) / (SELECT COUNT(*) FROM c), 4) AS click_to_purchase""".stripMargin)
    ),

    // ---- Batch MERGE/upsert (VERDICT r4 item #4): build an event_type-
    // partitioned target from `events`, merge a source of whole-row updates
    // (value doubled), partition-moving updates (event_type -> 'relocated')
    // and inserts (shifted keys), then surface the post-merge table as a
    // per-partition checksum. The oracle recomputes MERGE semantics
    // relationally (anti-join + union), so a dropped, duplicated or
    // stale-partition row anywhere in the write path flips the hash.
    // MergeSpec additionally proves untouched partitions stay byte-identical.
    QuerySpec(
      "merge_upsert",
      (s, dir) => {
        val root = s"${Dumps.forSf(dir)}/merge"
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        // fresh target per run (static overwrite clears a prior run's
        // 'relocated' partition, which dynamic mode would leave stale)
        e.write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "static")
          .partitionBy("event_type").parquet(s"$root/target")
        val updates = e.where(col("event_id") % 10 === 0)
          .withColumn("value", col("value") * 2)
        val moves = e.where(col("event_id") % 100 === 1)
          .withColumn("event_type", lit("relocated"))
        val inserts = e.where(col("event_id") % 10 === 7)
          .withColumn("event_id", col("event_id") + 10000000L)
          .withColumn("value", col("value") + 1)
        val merged = Merge.mergeIntoPartitioned(s, s"$root/target",
          updates.unionByName(moves).unionByName(inserts),
          Seq("event_id"), "event_type", s"$root/staging")
        merged.groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("event_id")).cast("bigint").as("id_sum"),
            dsum(col("value")).as("value_sum"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, value, event_type FROM events),
             |src AS (
             |  SELECT event_id, user_id, value * 2 AS value, event_type FROM e WHERE event_id % 10 = 0
             |  UNION ALL
             |  SELECT event_id, user_id, value, 'relocated' FROM e WHERE event_id % 100 = 1
             |  UNION ALL
             |  SELECT event_id + 10000000, user_id, value + 1, event_type FROM e WHERE event_id % 10 = 7),
             |merged AS (
             |  SELECT * FROM e WHERE event_id NOT IN (SELECT event_id FROM src)
             |  UNION ALL SELECT * FROM src)
             |SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum,
             |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
             |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // ---- Incremental mart maintenance: MERGE a change confined to one
    // fact partition, then refresh ONLY that partition's slice of a
    // partition-aligned mart (jobs/Incremental — re-aggregate the touched
    // fact partitions, dynamic-overwrite the touched mart partitions).
    // The oracle recomputes the whole mart from scratch over the merged
    // fact, so the hash proves initial-build + incremental-refresh is
    // EXACTLY from-scratch recomputation — the refresh missed nothing and
    // rewrote nothing it shouldn't have.
    QuerySpec(
      "mart_incremental_refresh",
      (s, dir) => {
        val root = s"${Dumps.forSf(dir)}/incr"
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        e.write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "static")
          .partitionBy("event_type").parquet(s"$root/fact")
        val martAgg = (df: org.apache.spark.sql.DataFrame) =>
          df.groupBy(col("event_type"),
              (col("user_id") % 10).cast("bigint").as("bucket"))
            .agg(
              count(lit(1)).as("n"),
              sum(col("event_id")).cast("bigint").as("id_sum"),
              dsum(col("value")).as("value_sum"))
        martAgg(s.read.parquet(s"$root/fact")).write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "static")
          .partitionBy("event_type").parquet(s"$root/mart")
        // a change confined to the 'click' partition (keys can't move)
        val src = e.where(col("event_type") === "click" && col("event_id") % 7 === 3)
          .withColumn("value", col("value") * 3)
        Merge.mergeIntoPartitioned(s, s"$root/fact", src,
          Seq("event_id"), "event_type", s"$root/staging", detectMoves = false)
        Incremental.refreshPartitions(s, s"$root/fact", s"$root/mart",
          "event_type", Seq("click"), martAgg)
        s.read.parquet(s"$root/mart")
          .select(col("event_type"), col("bucket"), col("n"),
            col("id_sum"), col("value_sum"))
          .orderBy(col("event_type"), col("bucket"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, value, event_type FROM events),
             |src AS (SELECT event_id, user_id, value * 3 AS value, event_type FROM e
             |        WHERE event_type = 'click' AND event_id % 7 = 3),
             |merged AS (
             |  SELECT * FROM e WHERE event_id NOT IN (SELECT event_id FROM src)
             |  UNION ALL SELECT * FROM src)
             |SELECT event_type, CAST(user_id % 10 AS BIGINT) AS bucket,
             |  COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum,
             |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
             |FROM merged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    )
  )
}
