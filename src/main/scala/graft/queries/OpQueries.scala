package graft.queries

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.Column

import graft.core.{Skew, Tables}
import graft.operators.{RangeJoin, Sessionize}
import graft.streaming.StreamingJobs

/** Round-3 operator queries: range join, sessionization, salted join
  * parity, ntile windows, and the streaming batch-parity gate.
  *
  * Each entry follows the QuerySpec determinism contract (total ORDER BY,
  * identical aliases both sides, decimal-exact money sums, BIGINT casts on
  * DuckDB SUM/window-SUM outputs which otherwise widen to HUGEINT).
  */
object OpQueries {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** memory-sink names must be fresh per invocation (bench runs each query
    * twice in one session; re-starting a terminated query under the same
    * name would shadow the previous temp view). */
  private val streamRun = new AtomicLong(0L)

  def all: Seq[QuerySpec] = Seq(

    // ---- Range join (point-in-interval): events.value against 50
    // overlapping value tiers. The binned rewrite keeps this an equi-join
    // (see graft.operators.RangeJoin) — the naive BETWEEN predicate would
    // plan a nested-loop, which PlanShapeSpec forbids registry-wide.
    QuerySpec(
      "j_range_tiers",
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("value"))
        val tiers = s.range(50).select(
          col("id").as("tier"),
          (col("id").cast("double") * 10.0).as("lo"),
          (col("id").cast("double") * 10.0 + 12.0 +
            (col("id") % 5).cast("double") * 3.0).as("hi"))
        RangeJoin.binnedPointInInterval(e, "value", tiers, "lo", "hi", binWidth = 16.0)
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy(col("tier"))
      },
      Some("""WITH tiers AS (
             |  SELECT CAST(k AS BIGINT) AS tier,
             |         CAST(k AS DOUBLE) * 10 AS lo,
             |         CAST(k AS DOUBLE) * 10 + 12 + CAST(k % 5 AS DOUBLE) * 3 AS hi
             |  FROM range(50) t(k))
             |SELECT t.tier, COUNT(*) AS n,
             |       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
             |FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // ---- Interval-overlap join over two generated interval sets. The
    // binned rewrite emits each overlapping pair exactly once (canonical
    // first-common-bin), so no distinct pass; the oracle runs the plain
    // quadratic overlap predicate, exact at oracle scale.
    QuerySpec(
      "j_range_overlap",
      (s, dir) => {
        val a = s.range(40).select(
          col("id").as("a_id"),
          (col("id").cast("double") * 12.5).as("alo"),
          (col("id").cast("double") * 12.5 + 8.0 +
            (col("id") % 4).cast("double") * 5.0).as("ahi"))
        val b = s.range(30).select(
          col("id").as("b_id"),
          (col("id").cast("double") * 17.0 + 3.0).as("blo"),
          (col("id").cast("double") * 17.0 + 13.0 +
            (col("id") % 3).cast("double") * 7.0).as("bhi"))
        RangeJoin.binnedOverlap(a, "alo", "ahi", b, "blo", "bhi", binWidth = 16.0)
          .groupBy(col("a_id"))
          .agg(count(lit(1)).as("n"), sum(col("b_id")).as("sum_b_id"))
          .orderBy(col("a_id"))
      },
      Some("""WITH a AS (
             |  SELECT CAST(k AS BIGINT) AS a_id,
             |         CAST(k AS DOUBLE) * 12.5 AS alo,
             |         CAST(k AS DOUBLE) * 12.5 + 8 + CAST(k % 4 AS DOUBLE) * 5 AS ahi
             |  FROM range(40) t(k)),
             |b AS (
             |  SELECT CAST(m AS BIGINT) AS b_id,
             |         CAST(m AS DOUBLE) * 17 + 3 AS blo,
             |         CAST(m AS DOUBLE) * 17 + 13 + CAST(m % 3 AS DOUBLE) * 7 AS bhi
             |  FROM range(30) t(m))
             |SELECT a_id, COUNT(*) AS n, CAST(SUM(b_id) AS BIGINT) AS sum_b_id
             |FROM a JOIN b ON alo < bhi AND blo < ahi
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // ---- Gap-based sessionization (4h inactivity gap), the batch twin of
    // the streaming session_window. All-integer output: session ids are
    // running sums (CAST from DuckDB's HUGEINT), durations integral DIV.
    QuerySpec(
      "w_sessionize",
      (s, dir) => {
        val sess = Sessionize.assign(
          Tables.events(s, dir), "user_id", "ts", "event_id", gapSec = 14400L)
        Sessionize.stats(sess, "user_id", "ts")
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us,
             |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
             |                OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |              > 14400000000 THEN 1 ELSE 0 END AS new_s
             |  FROM events),
             |sess AS (
             |  SELECT user_id, us,
             |         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM o)
             |SELECT user_id, session_id, COUNT(*) AS n_events,
             |       CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS duration_sec
             |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // ---- Salted-join exactness: Skew.saltedJoin (right side exploded
    // across 8 salts, join key widened to (key, salt)) must aggregate to
    // the same result as the plain join the oracle runs.
    QuerySpec(
      "j_salted_join",
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("event_type"), col("event_id"), col("value"))
        val dim = e.groupBy(col("event_type")).agg(count(lit(1)).as("type_total"))
        Skew.saltedJoin(e, dim, "event_type", "event_id", saltBuckets = 8)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            dsum(col("value")).as("total_value"),
            min(col("type_total")).as("type_total"))
          .orderBy(col("event_type"))
      },
      Some("""WITH dim AS (
             |  SELECT event_type, COUNT(*) AS type_total FROM events GROUP BY 1)
             |SELECT e.event_type, COUNT(*) AS n,
             |       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
             |       MIN(d.type_total) AS type_total
             |FROM events e JOIN dim d USING (event_type)
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // ---- ntile quartiles per type (window-function family beyond
    // rank/lag): ANSI ntile semantics match across engines; ties broken by
    // event_id so the bucket assignment is total-order stable.
    QuerySpec(
      "w_ntile_quartiles",
      (s, dir) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .groupBy(col("event_type"), col("quartile"))
          .agg(count(lit(1)).as("n"),
            min(col("value")).as("lo_value"),
            max(col("value")).as("hi_value"))
          .orderBy(col("event_type"), col("quartile"))
      },
      Some("""WITH q AS (
             |  SELECT event_type, value, event_id,
             |         ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile
             |  FROM events)
             |SELECT event_type, CAST(quartile AS BIGINT) AS quartile, COUNT(*) AS n,
             |       MIN(value) AS lo_value, MAX(value) AS hi_value
             |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // ---- Structured Streaming batch parity, oracle-checked: an
    // AvailableNow run of a streaming aggregation must hash-match the batch
    // SQL over the same files. Buckets are integral 6h windows over
    // event-time micros (parquet ts is timestamp[us]; both engines see
    // the identical micros under the UTC session timezone).
    QuerySpec(
      "stream_tumbling_counts",
      (s, dir) => {
        try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        catch { case _: Throwable => () }
        // layout-agnostic streaming source (file-in-dir or directory table)
        val src = StreamingJobs.tableStream(s, dir)
        val counts = src
          .select(expr("unix_micros(ts) DIV 21600000000").as("win_id"), col("event_type"))
          .groupBy(col("win_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val name = s"stream_tumbling_counts_${streamRun.incrementAndGet()}"
        StreamingJobs.withStatePartitions(s, 8)(
          StreamingJobs.runAvailableNow(counts, name, OutputMode.Complete()))
        s.table(name).orderBy(col("win_id"), col("event_type"))
      },
      Some("""SELECT CAST(epoch_us(ts) // 21600000000 AS BIGINT) AS win_id,
             |       event_type, COUNT(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // ---- Remaining window-function family: lead + first_value over the
    // hourly series (lag/rank/ntile covered elsewhere); all-BIGINT output.
    QuerySpec(
      "w_lead_bounds",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.events(s, dir)
          .groupBy(col("event_type"), hour(col("ts")).cast("long").as("event_hour"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("event_hour"))
        e.withColumn("next_n", lead(col("n"), 1).over(w))
          .withColumn("first_n", first(col("n")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .orderBy(col("event_type"), col("event_hour"))
      },
      Some("""WITH h AS (
             |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS event_hour, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, event_hour, n,
             |  lead(n, 1) OVER (PARTITION BY event_type ORDER BY event_hour) AS next_n,
             |  first_value(n) OVER (PARTITION BY event_type ORDER BY event_hour
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_n
             |FROM h ORDER BY event_type, event_hour""".stripMargin)
    ),

    // ---- Classic OLAP shapes beyond j2/q1: the TPC-H Q3 pattern
    // (selective dim filter -> fact join -> top-k by aggregated revenue,
    // TakeOrderedAndProject) and the Q5 pattern (six-way star with the
    // co-location condition c_nationkey = s_nationkey). Decimal-exact
    // revenue per the q1/j2 convention.
    QuerySpec(
      "q3_shipping_priority",
      (s, dir) => {
        val revenue = dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
        val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, dir).where(col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        val li = Tables.lineitem(s, dir).where(col("l_shipdate") > to_timestamp(lit("1998-01-01")))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(revenue).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND l_shipdate > TIMESTAMP '1998-01-01'
             |GROUP BY 1, 2, 3
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
    ),
    QuerySpec(
      "q5_local_supplier_volume",
      (s, dir) => {
        val revenue = dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
        val o = Tables.orders(s, dir)
          .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01")))
        Tables.lineitem(s, dir)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)),
            col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(sum(revenue).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin)
    ),

    // ---- Distribution windows: percent_rank / cume_dist / nth_value —
    // exact rational values ((rank-1)/(n-1), rank/n) identical across
    // engines; rounded anyway per the determinism contract.
    QuerySpec(
      "w_dist_ranks",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val h = Tables.events(s, dir)
          .groupBy(col("event_type"), hour(col("ts")).cast("long").as("event_hour"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("n"), col("event_hour"))
        h.select(col("event_type"), col("event_hour"), col("n"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"),
            nth_value(col("n"), 3).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("third_n"))
          .orderBy(col("event_type"), col("event_hour"))
      },
      Some("""WITH h AS (
             |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS event_hour, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, event_hour, n,
             |  ROUND(percent_rank() OVER w, 6) AS pr,
             |  ROUND(cume_dist() OVER w, 6) AS cd,
             |  nth_value(n, 3) OVER (PARTITION BY event_type ORDER BY n, event_hour
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_n
             |FROM h
             |WINDOW w AS (PARTITION BY event_type ORDER BY n, event_hour)
             |ORDER BY event_type, event_hour""".stripMargin)
    ),

    // ---- Explicit GROUPING SETS with grouping() markers (CUBE/ROLLUP
    // covered elsewhere); NULL ordering pinned explicitly on both sides
    // (Spark defaults NULLS FIRST asc, DuckDB NULLS LAST).
    QuerySpec(
      "agg_grouping_sets",
      (s, dir) => {
        Tables.events(s, dir)
          .withColumn("event_hour", hour(col("ts")).cast("long"))
          .createOrReplaceTempView("gs_events")
        s.sql("""SELECT event_type, event_hour,
                |  CAST(grouping(event_type) AS BIGINT) AS g_type,
                |  CAST(grouping(event_hour) AS BIGINT) AS g_hour,
                |  COUNT(*) AS n
                |FROM gs_events
                |GROUP BY GROUPING SETS ((event_type), (event_hour), ())
                |ORDER BY g_type, g_hour, event_type ASC NULLS FIRST,
                |  event_hour ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT event_type, CAST(hour(ts) AS BIGINT) AS event_hour,
             |  CAST(grouping(event_type) AS BIGINT) AS g_type,
             |  CAST(grouping(CAST(hour(ts) AS BIGINT)) AS BIGINT) AS g_hour,
             |  COUNT(*) AS n
             |FROM events
             |GROUP BY GROUPING SETS ((event_type), (CAST(hour(ts) AS BIGINT)), ())
             |ORDER BY g_type, g_hour, event_type ASC NULLS FIRST,
             |  event_hour ASC NULLS FIRST""".stripMargin)
    ),

    // ---- NULL-semantics gauntlet, hash-pinned: NULL keys form ONE group
    // in GROUP BY but match NOTHING in joins (left rows null-extend) —
    // the two NULL rules every engine must agree on. Ordering pinned
    // NULLS FIRST explicitly (engine defaults differ).
    QuerySpec(
      "null_semantics_gauntlet",
      (s, dir) => {
        val e = Tables.events(s, dir).select(
          when(col("event_id") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("event_type")).as("k"),
          col("value"))
        val dim = Tables.events(s, dir).select(col("event_type").as("k"))
          .distinct().withColumn("present", lit(1L))
        e.join(dim, Seq("k"), "left")
          .groupBy(col("k"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("present").isNull, 1L).otherwise(0L)).as("unmatched"))
          .orderBy(asc_nulls_first("k"))
      },
      Some("""WITH e AS (
             |  SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS k, value
             |  FROM events),
             |dim AS (SELECT DISTINCT event_type AS k, 1 AS present FROM events)
             |SELECT e.k, COUNT(*) AS n,
             |  CAST(SUM(CASE WHEN dim.present IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unmatched
             |FROM e LEFT JOIN dim ON e.k = dim.k
             |GROUP BY e.k ORDER BY e.k ASC NULLS FIRST""".stripMargin)
    ),

    // ---- Temporal-function parity beyond hour/dow: date_trunc month
    // keys, end-of-month clamping (add_months / last_day), day diffs from
    // an epoch anchor — all on the orders dates (midnight-aligned).
    QuerySpec(
      "e_date_functions",
      (s, dir) => {
        Tables.orders(s, dir)
          .groupBy(date_trunc("month", col("o_orderdate")).as("month_start"))
          .agg(
            count(lit(1)).as("n"),
            max(last_day(col("o_orderdate"))).cast("timestamp").as("eom"),
            min(add_months(col("o_orderdate"), 2)).cast("timestamp").as("plus2m"),
            max(datediff(col("o_orderdate"), lit("1995-01-01").cast("date")))
              .cast("long").as("max_day_offset"))
          .orderBy(col("month_start"))
      },
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start, COUNT(*) AS n,
             |  CAST(MAX(last_day(o_orderdate)) AS TIMESTAMP) AS eom,
             |  CAST(MIN(o_orderdate + INTERVAL 2 MONTH) AS TIMESTAMP) AS plus2m,
             |  CAST(MAX(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)) AS BIGINT) AS max_day_offset
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // ---- Count-min-sketch heavy hitters (sketch family beyond GK
    // quantiles and HLL distinct): one pass builds the mergeable sketch
    // (map-side partial aggregation — the 100 TB shape), the driver reads
    // it back and checks each key's estimate against the CMS guarantee
    // (exact ≤ est ≤ exact + ε·N at the configured confidence — here
    // deterministic for the fixed seed + dataset). The exact counts are
    // hash-checked vs DuckDB; the sketch estimates become a bound boolean
    // (VERDICT r3 item #1). The collect() reads back a ≤5-row grouped
    // aggregate — driver-side by design.
    QuerySpec(
      "agg_cms_heavy_hitters",
      (s, dir) => {
        import s.implicits._
        val e = Tables.events(s, dir)
        val skBytes = e
          .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)"))
          .head().getAs[Array[Byte]](0)
        val cms = org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(skBytes))
        val exact = e.groupBy(col("event_type")).agg(count(lit(1)).as("n_exact"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val n = exact.map(_._2).sum
        exact
          .map { case (k, cnt) =>
            val est = cms.estimateCount(k)
            (k, cnt, est >= cnt && est <= cnt + math.ceil(0.001 * n).toLong)
          }
          .toSeq.toDF("event_type", "n_exact", "cms_dentro_eps")
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n_exact, TRUE AS cms_dentro_eps
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // ---- Streaming session windows with watermark semantics, hash-pinned:
    // an append-mode session_window aggregation only emits sessions closed
    // before the final watermark (= max event time at 0s delay after an
    // AvailableNow drain). Both sides apply the same strict cutoff
    // (session end = last event + gap < max event time), so the oracle
    // pins exactly the watermark-finalized set. session_window splits at a
    // gap of EXACTLY 4h (the next event falls outside the half-open
    // window), hence the >= in the oracle's boundary flag.
    QuerySpec(
      "stream_session_windows",
      (s, dir) => {
        try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        catch { case _: Throwable => () }
        val batch = Tables.events(s, dir)
        val maxUs = batch.selectExpr("max(unix_micros(ts))").first().getLong(0)
        // layout-agnostic source: file-in-dir (test data) or directory
        // table (10x scale corpora) — see StreamingJobs.tableStream
        val src = StreamingJobs.tableStream(s, dir)
        val sess = src
          .withColumn("ets", col("ts"))
          .withWatermark("ets", "0 seconds")
          .groupBy(col("user_id"), session_window(col("ets"), "4 hours"))
          .agg(count(lit(1)).as("n_events"))
        val name = s"stream_session_windows_${streamRun.incrementAndGet()}"
        StreamingJobs.withStatePartitions(s, 8)(
          StreamingJobs.runAvailableNow(sess, name, OutputMode.Append()))
        s.table(name)
          .where(unix_micros(col("session_window.end")) < lit(maxUs))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("session_start_us"),
            col("n_events"))
          .orderBy(col("user_id"), col("session_start_us"))
      },
      Some("""WITH mx AS (SELECT MAX(epoch_us(ts)) AS max_us FROM events),
             |o AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us,
             |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
             |                OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |              >= 14400000000 THEN 1 ELSE 0 END AS new_s
             |  FROM events),
             |sess AS (
             |  SELECT user_id, us,
             |         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
             |  FROM o),
             |g AS (
             |  SELECT user_id, sid, MIN(us) AS session_start_us,
             |         MAX(us) AS last_us, COUNT(*) AS n_events
             |  FROM sess GROUP BY 1, 2)
             |SELECT user_id, session_start_us, n_events
             |FROM g, mx WHERE last_us + 14400000000 < max_us
             |ORDER BY 1, 2""".stripMargin)
    )
  )
}
