package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def points = Seq(
    (1L, 0.0), (2L, 4.9), (3L, 5.0), (4L, 15.99), (5L, 16.0),
    (6L, 47.5), (7L, -3.0), (8L, 100.0)
  ).toDF("pid", "v")

  // overlapping, multi-bin-spanning, degenerate (hi < lo), and
  // boundary-aligned intervals
  private def intervals = Seq(
    ("a", 0.0, 5.0),     // [0,5): pid 1,2 — 5.0 excluded
    ("b", 4.0, 50.0),    // spans 3 bins of width 16: pids 2..6
    ("c", 16.0, 16.0),   // empty half-open range
    ("d", 20.0, 10.0),   // degenerate hi < lo
    ("e", -10.0, 0.5)    // negative lo: pids 7, 1
  ).toDF("iid", "lo", "hi")

  private def naive = points.crossJoin(intervals)
    .where($"v" >= $"lo" && $"v" < $"hi")
    .select("pid", "iid")

  test("binned range join matches the naive cross-filter on every bin width") {
    val expected = naive.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(expected.nonEmpty)
    for (w <- Seq(1.0, 7.5, 16.0, 1000.0)) {
      val got = RangeJoin
        .binnedPointInInterval(points, "v", intervals, "lo", "hi", w)
        .select("pid", "iid").collect()
      // exactly once per matching pair: compare as a multiset via sizes
      assert(got.length == expected.size, s"binWidth=$w duplicated or dropped pairs")
      assert(got.map(r => (r.getLong(0), r.getString(1))).toSet == expected, s"binWidth=$w")
    }
  }

  test("boundary semantics: lo inclusive, hi exclusive") {
    val got = RangeJoin.binnedPointInInterval(points, "v", intervals, "lo", "hi", 16.0)
      .select("pid", "iid").as[(Long, String)].collect().toSet
    assert(got.contains((1L, "a")))   // v=0.0 == lo included
    assert(!got.contains((3L, "a")))  // v=5.0 == hi excluded
    assert(got.exists(_._2 == "e"))   // negative-lo interval still matches
    assert(!got.exists(_._2 == "c") && !got.exists(_._2 == "d")) // empty/degenerate
  }

  test("binned overlap join matches naive cross-filter, each pair exactly once") {
    // includes touching-at-boundary (half-open: no overlap), containment,
    // identical ranges, and multi-bin spans
    val as = Seq(("a1", 0.0, 10.0), ("a2", 10.0, 20.0), ("a3", 5.0, 50.0), ("a4", 60.0, 61.0))
      .toDF("aid", "alo", "ahi")
    val bs = Seq(("b1", 9.0, 10.5), ("b2", 10.0, 20.0), ("b3", 0.0, 100.0), ("b4", 50.0, 60.0))
      .toDF("bid", "blo", "bhi")
    val expected = as.crossJoin(bs)
      .where($"alo" < $"bhi" && $"blo" < $"ahi")
      .select("aid", "bid").as[(String, String)].collect().toSet
    assert(expected.nonEmpty)
    for (w <- Seq(1.0, 16.0, 300.0)) {
      val got = RangeJoin.binnedOverlap(as, "alo", "ahi", bs, "blo", "bhi", w)
        .select("aid", "bid").as[(String, String)].collect()
      assert(got.length == expected.size, s"binWidth=$w duplicated or dropped pairs")
      assert(got.toSet == expected, s"binWidth=$w")
    }
    // half-open semantics: a2=[10,20) does not overlap b4=[50,60); a4=[60,61) not b4
    assert(!expected.contains(("a4", "b4")))
  }

  test("randomized: both variants match naive on seeded-random inputs") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val pts = Seq.tabulate(60)(i => (i.toLong, rnd.nextDouble() * 200 - 50))
        .toDF("pid", "v")
      def ivs(n: Int) = Seq.tabulate(n) { i =>
        val lo = rnd.nextDouble() * 200 - 60
        // mix of tiny, normal, huge, and degenerate (negative-width) ranges
        val width = rnd.nextInt(4) match {
          case 0 => rnd.nextDouble() * 0.5
          case 1 => rnd.nextDouble() * 20
          case 2 => rnd.nextDouble() * 150
          case _ => -rnd.nextDouble() * 5
        }
        (s"i$i", lo, lo + width)
      }
      val as = ivs(25).toDF("iid", "lo", "hi")
      val w = Seq(0.7, 5.0, 33.0)(trial % 3)

      val naivePt = pts.crossJoin(as).where($"v" >= $"lo" && $"v" < $"hi")
        .select("pid", "iid").as[(Long, String)].collect().sorted.toSeq
      val binnedPt = RangeJoin.binnedPointInInterval(pts, "v", as, "lo", "hi", w)
        .select("pid", "iid").as[(Long, String)].collect().sorted.toSeq
      assert(binnedPt == naivePt, s"point-in-interval trial=$trial w=$w")

      val bs = ivs(25).toDF("jid", "blo", "bhi")
      val naiveOv = as.crossJoin(bs).where($"lo" < $"bhi" && $"blo" < $"hi")
        .select("iid", "jid").as[(String, String)].collect().sorted.toSeq
      val binnedOv = RangeJoin.binnedOverlap(as, "lo", "hi", bs, "blo", "bhi", w)
        .select("iid", "jid").as[(String, String)].collect().sorted.toSeq
      assert(binnedOv == naiveOv, s"overlap trial=$trial w=$w")
    }
  }

  test("plans an equi-join on the bin key, not a nested-loop join") {
    val plan = RangeJoin
      .binnedPointInInterval(points, "v", intervals, "lo", "hi", 16.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to an all-pairs join:\n$plan")
  }
}
