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
}
