package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("strict-gap boundary: gap == threshold stays, gap > threshold splits") {
    val events = Seq(
      (1L, ts(0), 1L), (1L, ts(600), 2L),    // gap 600 == threshold: same session
      (1L, ts(1201), 3L),                    // gap 601 > threshold: new session
      (2L, ts(0), 4L)                        // other user independent
    ).toDF("user_id", "ts", "event_id")
    val got = Sessionize.assign(events, "user_id", "ts", "event_id", gapSec = 600L)
      .select("user_id", "event_id", "session_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 0L), (1L, 2L, 0L), (1L, 3L, 1L), (2L, 4L, 0L)))
  }

  test("ties on ts are ordered by the tie-break column") {
    val events = Seq(
      (1L, ts(0), 2L), (1L, ts(0), 1L), (1L, ts(700), 3L)
    ).toDF("user_id", "ts", "event_id")
    val got = Sessionize.assign(events, "user_id", "ts", "event_id", gapSec = 600L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toSet
    // both t=0 events are session 0 regardless of row order; t=700 splits
    assert(got == Set((1L, 0L), (2L, 0L), (3L, 1L)))
  }

  test("stats: integral floor duration and per-session counts") {
    val events = Seq(
      (1L, new Timestamp(1500L), 1L),        // 1.5s
      (1L, new Timestamp(3999L), 2L)         // 3.999s -> duration 2.499s -> floor 2
    ).toDF("user_id", "ts", "event_id")
    val sess = Sessionize.assign(events, "user_id", "ts", "event_id", gapSec = 600L)
    val got = Sessionize.stats(sess, "user_id", "ts")
      .select("user_id", "session_id", "n_events", "duration_sec")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 2L, 2L)))
  }

  test("one exchange: both window passes share a single shuffle on the entity") {
    val events = Seq((1L, ts(0), 1L)).toDF("user_id", "ts", "event_id")
    val plan = Sessionize.assign(events, "user_id", "ts", "event_id", 600L)
      .queryExecution.executedPlan.toString
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 1,
      s"sessionize should need at most one exchange:\n$plan")
  }
}
