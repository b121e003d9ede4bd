package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.TestSpark

/** The count-min-sketch error contract: estimates never undercount, and
  * overcount by at most eps * stream-size (here eps = 0.001) — with a
  * 5-key stream the estimate should in fact be exact. */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CMS estimates bound the exact counts per the eps*N guarantee") {
    val rows = SparkEntry.queries("agg_cms_heavy_hitters")(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: empty key group")
      assert(r.getBoolean(2),
        s"${r.getString(0)}: CMS estimate outside [exact, exact + eps*N]")
    }
  }
}
