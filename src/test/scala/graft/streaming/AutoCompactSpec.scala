package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.Lifecycle

/** Bronze-layer ingest composition: append-mode micro-batches accrete
  * small files; periodic in-loop compaction folds them back while the
  * stream keeps running. Contents must equal the union of every batch,
  * and the final file count must be bounded by the compaction target, not
  * by the batch count. */
class AutoCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed appends stay scannable: compaction bounds files, preserves rows") {
    val src = Files.createTempDirectory("ac-src").toFile.getAbsolutePath
    val table = Files.createTempDirectory("ac-tbl").toFile.getAbsolutePath
    val staging = Files.createTempDirectory("ac-stage").toFile.getAbsolutePath
    val checkpoint = Files.createTempDirectory("ac-ckpt").toFile.getAbsolutePath

    // seed the table (schema source + a pre-existing partition)
    Seq((0L, 0.0, "p0")).toDF("id", "v", "p")
      .coalesce(1).write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("p").parquet(table)

    // 6 source files -> 6 micro-batches, each appending 2 files (p0+p1)
    (1 to 6).foreach { b =>
      Seq((b.toLong, b * 1.0, "p0"), (b + 100L, b * 2.0, "p1"))
        .toDF("id", "v", "p")
        .coalesce(1).write.mode("append").parquet(src)
    }

    StreamingJobs.streamingIngestWithAutoCompact(spark, src, table, "p",
      staging, checkpoint, compactEvery = 3, targetFileBytes = 64L * 1024 * 1024)

    val got = spark.read.parquet(table).select("id", "v", "p")
      .as[(Long, Double, String)].collect().toSet
    val want = Set((0L, 0.0, "p0")) ++
      (1 to 6).flatMap(b => Seq((b.toLong, b * 1.0, "p0"), (b + 100L, b * 2.0, "p1"))).toSet
    assert(got == want, "auto-compaction must not lose or duplicate a single row")

    // batches 0..5 ran, compaction fired after batch 2 and batch 5: without
    // it p0 would hold 7 files (seed + 6 appends); after the final-batch
    // compaction each partition is back to its byte-justified single file
    val parts = Lifecycle.listPartitionFiles(spark, table, Seq("p"))
    assert(parts.map(_.values).toSet == Set(Seq("p0"), Seq("p1")))
    parts.foreach { pf =>
      assert(pf.files == 1, s"partition ${pf.values} still fragmented: ${pf.files} files")
    }
  }
}
