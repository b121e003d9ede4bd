package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkippingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clustered(root: String): Unit =
    (0L until 4000L).map(i => (i, i % 7, s"row$i")).toDF("id", "grp", "s")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(root)

  test("footer index envelopes match the actual per-file min/max") {
    val root = Files.createTempDirectory("skip").toFile.getAbsolutePath
    clustered(root)
    val idx = Skipping.buildIndex(spark, root)
    assert(idx.size == 8)
    assert(idx.map(_.rows).sum == 4000L)
    idx.foreach { f =>
      val actual = spark.read.parquet(f.path)
        .agg(min("id"), max("id")).as[(Long, Long)].head()
      assert(f.mins("id") == actual._1 && f.maxs("id") == actual._2,
        s"footer stats disagree with data for ${f.path}")
    }
    // envelopes are disjoint slices of a range-clustered layout
    val spans = idx.map(f => (f.mins("id"), f.maxs("id"))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2)
      case _ => ()
    }
  }

  test("pruned scan reads strictly fewer files yet returns exactly the filtered rows") {
    val root = Files.createTempDirectory("skip").toFile.getAbsolutePath
    clustered(root)
    val idx = Skipping.buildIndex(spark, root)
    val kept = Skipping.pruneFiles(idx, "id", 1000L, 1499L)
    assert(kept.size < idx.size, "a selective range over a clustered layout must prune")
    val pruned = Skipping.scanPruned(spark, idx, "id", 1000L, 1499L)
      .select("id").as[Long].collect().toSet
    assert(pruned == (1000L to 1499L).toSet)
  }

  test("a column with no stats (string) cannot prune") {
    val root = Files.createTempDirectory("skip").toFile.getAbsolutePath
    clustered(root)
    val idx = Skipping.buildIndex(spark, root)
    assert(Skipping.pruneFiles(idx, "s", 0L, 1L).size == idx.size)
  }

  test("an unclustered layout prunes nothing (every envelope spans the domain)") {
    val root = Files.createTempDirectory("skip-flat").toFile.getAbsolutePath
    // round-robin layout: every file sees the whole id range
    (0L until 4000L).map(i => (i, s"row$i")).toDF("id", "s")
      .repartition(8)
      .write.mode("overwrite").parquet(root)
    val idx = Skipping.buildIndex(spark, root)
    val kept = Skipping.pruneFiles(idx, "id", 1000L, 1499L)
    assert(kept.size == idx.size,
      "without clustering min/max skipping cannot help — the layout is the index")
  }
}
