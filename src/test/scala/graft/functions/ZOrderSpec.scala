package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Skipping

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference Morton implementation: bit-by-bit, no magic numbers. */
  private def mortonRef(a: Int, b: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((a >> i) & 1).toLong << (2 * i)) |
        (((b >> i) & 1).toLong << (2 * i + 1))
    }

  test("interleave16 matches the bit-by-bit reference on the 8-bit grid and 16-bit edges") {
    val pairs =
      (for (a <- 0 until 256 by 17; b <- 0 until 256 by 13) yield (a, b)) ++
        Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535), (32768, 1), (1, 32768))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.interleave16(col("a"), col("b")))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == mortonRef(a, b), s"interleave16($a,$b)")
    }
  }

  test("z-cell layout prunes files for range predicates on EITHER dimension") {
    val root = Files.createTempDirectory("zorder").toFile.getAbsolutePath
    // full 256x256 grid laid out by explicit z-cell => each of the 16 leaf
    // dirs is an exact 64x64-aligned rectangle of the (a,b) domain
    val grid = (for (a <- 0 until 256; b <- 0 until 256) yield (a.toLong, b.toLong))
      .toDF("a", "b")
      .withColumn("zcode", ZOrder.interleave16(col("a"), col("b")))
      .withColumn("zcell", expr("zcode DIV 4096"))
    grid.repartition(4, col("zcell"))
      .write.mode("overwrite").partitionBy("zcell").parquet(root)

    val idx = Skipping.buildIndex(spark, root, recursive = true)
    val total = idx.size
    val keptA = Skipping.pruneFiles(idx, "a", 0L, 63L)
    val keptB = Skipping.pruneFiles(idx, "b", 0L, 63L)
    // cells are (b7,a7,b6,a6) quadrants: a<=63 keeps the 4 cells with
    // a7=a6=0; b<=63 keeps the 4 with b7=b6=0 — both dims prune to 1/4
    assert(keptA.size < total && keptB.size < total)
    val filesPerCell = idx.size / 16.0
    assert(keptA.size <= math.ceil(filesPerCell * 4).toInt)
    assert(keptB.size <= math.ceil(filesPerCell * 4).toInt)

    // pruning is invisible to results
    val viaPrune = spark.read.parquet(keptA: _*)
      .where(col("a").between(0, 63)).count()
    assert(viaPrune == 64L * 256L)
  }

  test("single-key clustering cannot prune the other dimension (why Z-order exists)") {
    val root = Files.createTempDirectory("akey").toFile.getAbsolutePath
    val grid = (for (a <- 0 until 256; b <- 0 until 256) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(root)
    val idx = Skipping.buildIndex(spark, root)
    assert(Skipping.pruneFiles(idx, "a", 0L, 63L).size < idx.size)
    assert(Skipping.pruneFiles(idx, "b", 0L, 63L).size == idx.size,
      "b is uniform within every a-slice: no file can be skipped")
  }
}
