package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** The custom as-of join (LogicalPlan + Strategy + SparkPlan) vs an
  * equivalent composed from built-ins (union + last-ignoring-nulls window):
  * identical results, but the custom operator never shuffles or sorts the
  * fact side — the window equivalent shuffles EVERYTHING by key. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // rates dimension: per event_type, a rate becoming valid at hour H
  private lazy val rates = Seq(
    ("click", "2024-01-01 00:00:00", 1.0),
    ("click", "2024-01-01 09:00:00", 2.5),
    ("click", "2024-01-01 18:00:00", 4.0),
    ("view", "2024-01-01 06:00:00", 0.5),
    ("view", "2024-01-01 12:00:00", 0.75)
  ).toDF("event_type", "valid_from", "rate")
    .withColumn("valid_from", to_timestamp($"valid_from"))

  private lazy val events = Tables.events(spark, TestSpark.sfDir)
    .select($"event_id", $"ts",
      element_at(array(lit("click"), lit("view"), lit("scroll")),
        ($"event_id" % 3).cast("int") + 1).as("event_type"))

  test("as-of join matches the window-composed equivalent exactly") {
    val asof = AsOf.join(events, rates, key = "event_type", leftTs = "ts", rightTs = "valid_from")
      .select($"event_id", $"rate")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1))).toMap

    // built-in composition: union left+right per key ordered by ts (right
    // rows sort before left rows at equal ts), carry the last non-null rate
    val l = events.select($"event_type", $"ts", lit(1).as("is_left"), $"event_id",
      lit(null).cast("double").as("rate"))
    val r = rates.select($"event_type", $"valid_from".as("ts"), lit(0).as("is_left"),
      lit(null).cast("long").as("event_id"), $"rate")
    val w = Window.partitionBy($"event_type").orderBy($"ts", $"is_left")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = l.unionByName(r)
      .withColumn("rate_asof", last($"rate", ignoreNulls = true).over(w))
      .filter($"is_left" === 1)
      .select($"event_id", $"rate_asof")
      .collect().map(r2 => (r2.getLong(0), if (r2.isNullAt(1)) null else r2.getDouble(1))).toMap

    assert(asof.size == composed.size && asof == composed)
    // semantics spot-check: 'scroll' has no rates -> null-extended
    assert(asof.exists(_._2 == null))
    assert(asof.values.exists(_ != null))
  }

  test("the custom exec neither shuffles nor sorts the fact side") {
    val plan = AsOf.join(events, rates, "event_type", "ts", "valid_from")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), plan.take(500))
    assert(!plan.contains("Exchange"), s"as-of join must not shuffle:\n$plan")
    assert(!plan.contains("Sort"), s"as-of join must not sort the fact side:\n$plan")
  }

  test("ties and exact-timestamp matches take the row valid AT the event time") {
    val ev = Seq((1L, "2024-01-01 09:00:00", "click"), (2L, "2024-01-01 08:59:59", "click"))
      .toDF("event_id", "ts", "event_type").withColumn("ts", to_timestamp($"ts"))
    val out = AsOf.join(ev, rates, "event_type", "ts", "valid_from")
      .select($"event_id", $"rate").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out(1L) == 2.5) // rate that became valid exactly at 09:00 applies
    assert(out(2L) == 1.0) // one second earlier still sees the old rate
  }

  // big-right regime: per-event-id state history far too large to broadcast
  // in spirit — drives the sort-merge variant and checks exact parity with
  // the broadcast variant AND the window-composed equivalent.
  private lazy val bigHistory = {
    // 200 keys x 50 versions each; valid_from every 7 minutes from midnight
    spark.sql(
      """SELECT CAST(id % 200 AS STRING) AS k,
        |  timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,CAST(7 * (id / 200) AS INT),0) AS valid_from,
        |  CAST(id AS DOUBLE) AS version
        |FROM range(10000)""".stripMargin)
  }

  private lazy val bigEvents = Tables.events(spark, TestSpark.sfDir)
    .select($"event_id", $"ts", ($"event_id" % 250).cast("string").as("k"))
    // keys 200..249 have no history -> null-extended leg comes for free

  test("sort-merge variant matches broadcast variant and window equivalent on a big right side") {
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", $"version")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1))).toMap

    val merge = toMap(AsOf.join(bigEvents, bigHistory, "k", "ts", "valid_from", strategy = "merge"))
    val bcast = toMap(AsOf.join(bigEvents, bigHistory, "k", "ts", "valid_from", strategy = "broadcast"))
    assert(merge == bcast)

    val l = bigEvents.select($"k", $"ts", lit(1).as("is_left"), $"event_id",
      lit(null).cast("double").as("version"))
    val r = bigHistory.select($"k", $"valid_from".as("ts"), lit(0).as("is_left"),
      lit(null).cast("long").as("event_id"), $"version")
    val w = Window.partitionBy($"k").orderBy($"ts", $"is_left")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = l.unionByName(r)
      .withColumn("version_asof", last($"version", ignoreNulls = true).over(w))
      .filter($"is_left" === 1)
      .select($"event_id", $"version_asof".as("version"))
    assert(merge == toMap(composed))
    assert(merge.values.exists(_ == null) && merge.values.exists(_ != null))
  }

  test("sort-merge plan co-partitions both sides and adds nothing beyond exchange+sort") {
    val plan = AsOf.join(bigEvents, bigHistory, "k", "ts", "valid_from", strategy = "merge")
      .queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("SortMergeAsOfJoin"), s.take(800))
    // exactly the co-partitioning machinery: one exchange + one sort per side
    assert("(?m)^.*Exchange hashpartitioning".r.findAllIn(s).size == 2, s)
    assert("(?m)^.*\\bSort \\[".r.findAllIn(s).size == 2, s)
  }

  test("auto strategy picks broadcast under the threshold and merge above it") {
    val small = AsOf.join(events, rates, "event_type", "ts", "valid_from")
      .queryExecution.executedPlan.toString
    assert(small.contains("BroadcastAsOfJoin"), small.take(500))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val big = AsOf.join(events, rates, "event_type", "ts", "valid_from")
        .queryExecution.executedPlan.toString
      assert(big.contains("SortMergeAsOfJoin"), big.take(500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
