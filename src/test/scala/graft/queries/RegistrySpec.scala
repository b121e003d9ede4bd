package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.TestSpark

/** Fast whole-registry smoke at sf0.001: every declared query must build a
  * plan and produce rows (the sf0.01 DuckDB hash compare is the driver's
  * stronger gate; this catches breakage early and covers the no-oracle
  * queries too). ML queries are excluded here for test-time reasons — they
  * have their own suite (PipelinesSpec). */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val skip = Set("ml_gbt_score", "ml_rf_score", "ml_metrics_record")

  SparkEntry.registry.filterNot(q => skip(q.name)).foreach { q =>
    test(s"query ${q.name} runs at sf0.001 and returns rows") {
      val n = q.fn(spark, TestSpark.sfDir).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("oracle SQL map only names registered queries, names unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }
}
