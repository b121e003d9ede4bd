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

  test("a persisted index round-trips and prunes identically to footer reads") {
    val root = Files.createTempDirectory("skip").toFile.getAbsolutePath
    val idxPath = Files.createTempDirectory("skip-idx").toFile.getAbsolutePath
    clustered(root)
    val idx = Skipping.buildIndex(spark, root)
    Skipping.writeIndex(spark, idx, idxPath)
    val loaded = Skipping.readIndex(spark, idxPath)
    assert(loaded.toSet == idx.toSet)
    assert(Skipping.pruneFiles(loaded, "id", 1000L, 1499L).toSet
      == Skipping.pruneFiles(idx, "id", 1000L, 1499L).toSet)
  }

  test("bloom equality pruning works exactly where min/max cannot: unclustered point lookup") {
    val root = Files.createTempDirectory("skip-bloom").toFile.getAbsolutePath
    (0L until 4000L).map(i => (i, s"key$i")).toDF("id", "k")
      .repartition(8)
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#k", "true")
      .option("parquet.bloom.filter.expected.ndv#k", "4000")
      .parquet(root)
    val total = Skipping.dataFiles(spark, root).size
    assert(total == 8)
    val kept = Skipping.pruneFilesByBloomEquality(spark, root, "k", "key2024")
    assert(kept.size < total, "bloom must rule out files not holding the key")
    val got = spark.read.parquet(kept: _*).where(col("k") === "key2024")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(2024L), "pruning must be invisible to the lookup result")
    // a value that exists nowhere: no false negatives allowed, and the
    // lookup over whatever files survive finds nothing
    val keptMissing = Skipping.pruneFilesByBloomEquality(spark, root, "k", "absent")
    if (keptMissing.nonEmpty) {
      assert(spark.read.parquet(keptMissing: _*)
        .where(col("k") === "absent").count() == 0)
    }
    // a column without a bloom cannot prune
    assert(Skipping.pruneFilesByBloomEquality(spark, root, "id", "7").size == total)
  }
}
