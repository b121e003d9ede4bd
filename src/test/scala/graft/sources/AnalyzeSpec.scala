package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.Snapshots

/** ANALYZE TABLE … FOR COLUMNS: per-column NDV/nulls/min/max computed in
  * one pass, persisted as table properties, surfaced through the catalog
  * as CatalogColumnStat — CBO's inputs. */
class AnalyzeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("anl").toFile.getAbsolutePath + "/t"

  test("analyzeColumns computes and persists exact-where-exact stats") {
    val root = tmp()
    val df = (1L to 100L)
      .map(i => (i, s"u${i % 7}", if (i % 10 == 0) null else s"t${i % 3}"))
      .toDF("k", "name", "tag")
    Snapshots.init(spark, root, df)
    val out = spark.sql(
      s"ANALYZE TABLE graft.`$root` COMPUTE STATISTICS FOR COLUMNS k, name, tag")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("k", "name", "tag"))
    assert(out("k").getLong(2) == 0L && out("tag").getLong(2) == 10L,
      "null counts are exact")
    assert(out("k").getString(3) == "1" && out("k").getString(4) == "100",
      "min/max external strings")
    assert(out("name").getLong(1) == 7L, "HLL is exact at tiny cardinality")

    // round-trip through the stored properties
    val stored = Snapshots.columnStatistics(spark, root)
    assert(stored("tag").nullCount == 10L && stored("tag").ndv == 3L)
    assert(stored("name").min.contains("u0") && stored("name").max.contains("u6"))
    assert(stored("name").maxLen.exists(_ >= 2L))

    // the ANALYZE commit is metadata-only
    val h = Snapshots.history(spark, root).where(col("version") === 1).head()
    assert(h.getAs[Long]("n_added") == 0L && h.getAs[Long]("n_removed") == 0L)
  }

  test("catalog reads surface colStats to Catalyst; CBO consumes them") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 500L).map(i => (i, s"g${i % 5}")).toDF("k", "grp"))
    spark.sql(s"ANALYZE TABLE graft.`$root` COMPUTE STATISTICS FOR ALL COLUMNS")
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val plan = spark.sql(s"SELECT * FROM graft.`$root` WHERE grp = 'g3'")
        .queryExecution.optimizedPlan
      val rel = plan.collectFirst {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
      }.getOrElse(fail("no LogicalRelation under the catalog read"))
      val attrStats = rel.stats.attributeStats
      assert(attrStats.nonEmpty, "column stats reach the plan")
      val grpStat = attrStats.find(_._1.name == "grp").map(_._2)
        .getOrElse(fail("no stat for grp"))
      assert(grpStat.distinctCount.contains(BigInt(5)))
      // selectivity: the filtered estimate uses NDV (≈ rows/5), not the
      // no-stats fallback (full row count)
      val est = plan.stats.rowCount
      assert(est.exists(rc => rc >= BigInt(50) && rc <= BigInt(250)),
        s"NDV-driven filter selectivity, got $est")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
  }

  test("unknown columns refused; plain COMPUTE STATISTICS is the log no-op") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((1L, "a")).toDF("k", "v"))
    val e = intercept[Exception] {
      spark.sql(s"ANALYZE TABLE graft.`$root` COMPUTE STATISTICS FOR COLUMNS nope")
        .collect()
    }
    assert(e.getMessage.contains("nope"))
    assert(spark.sql(s"ANALYZE TABLE graft.`$root` COMPUTE STATISTICS")
      .collect().isEmpty, "size/rows already ride every catalog read")
  }
}
