package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Clean
import graft.serve.Report

/** Property tests (SURVEY.md §5): algebraic invariants checked over many
  * seeded-random inputs (plain `scala.util.Random` — the scalatest/
  * scalacheck bridge artifact is not in the offline cache). */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val trials = 10

  test("P1 standardizeColumns is idempotent over random column subsets") {
    val pool = Seq("TPEP_PICKUP_DATETIME", "PULocationID", "trip_distance", "DOLocationID", "extra_col")
    val rnd = new scala.util.Random(42)
    (1 to trials).foreach { _ =>
      val names = rnd.shuffle(pool).take(1 + rnd.nextInt(pool.size))
      val df = names.zipWithIndex
        .foldLeft(Seq(1).toDF("__seed")) { case (d, (n, i)) => d.withColumn(n, lit(i)) }
        .drop("__seed")
      val once = Clean.standardizeColumns(df)
      val twice = Clean.standardizeColumns(once)
      assert(once.columns.toSeq == twice.columns.toSeq, s"input cols: $names")
    }
  }

  test("MERGE: random upsert batch sequences match an in-memory model") {
    // model: a Map[key -> row]; each batch is last-writer-wins per key,
    // rows may change partition. After every batch, the on-disk table must
    // equal the model exactly — catching lost inserts, surviving stale
    // rows, and partition-move leaks across arbitrary interleavings.
    val rnd = new scala.util.Random(11)
    val parts = Seq("pa", "pb", "pc")
    val root = java.nio.file.Files.createTempDirectory("merge-prop").toFile.getAbsolutePath
    val staging = java.nio.file.Files.createTempDirectory("merge-prop-stage").toFile.getAbsolutePath
    def randRows(n: Int): Seq[(String, Long, String)] =
      Seq.fill(n)((s"k${rnd.nextInt(12)}", rnd.nextInt(1000).toLong, parts(rnd.nextInt(parts.size))))
    var model: Map[String, (Long, String)] =
      randRows(8).map { case (k, v, p) => k -> (v, p) }.toMap
    model.toSeq.map { case (k, (v, p)) => (k, v, p) }.toDF("k", "v", "p")
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("p").parquet(root)
    (1 to 5).foreach { i =>
      val batchRows = randRows(1 + rnd.nextInt(5))
      val batch = batchRows.map { case (k, v, p) => k -> (v, p) }.toMap // last wins per key
      model = model ++ batch.map { case (k, (v, p)) => k -> (v, p) }
      val merged = graft.jobs.Merge.mergeIntoPartitioned(spark, root,
        batch.toSeq.map { case (k, (v, p)) => (k, v, p) }.toDF("k", "v", "p"),
        Seq("k"), "p", staging)
      val got = merged.select("k", "v", "p").as[(String, Long, String)]
        .collect().map { case (k, v, p) => k -> (v, p) }.toMap
      assert(got == model, s"batch $i diverged (batch=$batchRows)")
    }
  }

  test("A12 weighted average of per-group averages equals the global average") {
    val rnd = new scala.util.Random(7)
    (1 to trials).foreach { _ =>
      val rows = Seq.fill(30)((rnd.nextInt(5), rnd.nextDouble() * 2000 - 1000))
      val df = rows.toDF("g", "v")
      val global = df.agg(avg($"v")).head.getDouble(0)
      val marts = df.groupBy("g").agg(avg($"v").as("a"), count(lit(1)).as("n"))
      val rolled = marts.agg((sum($"a" * $"n") / sum($"n")).as("w")).head.getDouble(0)
      assert(math.abs(global - rolled) < 1e-9 * math.max(1.0, math.abs(global)))
    }
  }

  test("E13 pctOfTotal always sums to 100 for positive metrics") {
    val rnd = new scala.util.Random(11)
    (1 to trials).foreach { _ =>
      val df = Seq.tabulate(10)(i => (s"k$i", 1L + rnd.nextInt(100000).toLong)).toDF("k", "n")
      val total = Report.pctOfTotal(df, "n").agg(sum("pct")).head.getDouble(0)
      assert(math.abs(total - 100.0) < 1e-9)
    }
  }

  test("E9 percentile array unpack round-trips against scalar percentiles") {
    val rnd = new scala.util.Random(13)
    (1 to trials).foreach { _ =>
      val df = Seq.fill(50)(rnd.nextDouble() * 2e6 - 1e6).toDF("v")
      val arr = df.agg(expr("percentile(v, array(0.25, 0.5, 0.75))").as("p"))
        .select(col("p").getItem(0), col("p").getItem(1), col("p").getItem(2))
        .head
      val scalars = df.agg(
        expr("percentile(v, 0.25)"), expr("percentile(v, 0.5)"), expr("percentile(v, 0.75)")
      ).head
      (0 to 2).foreach(i => assert(arr.getDouble(i) == scalars.getDouble(i)))
    }
  }

  test("ImageHeaders agrees with the JDK encoder for random dims across all four formats") {
    val rnd = new scala.util.Random(7)
    (1 to trials).foreach { _ =>
      val w = 1 + rnd.nextInt(500)
      val h = 1 + rnd.nextInt(500)
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(rnd.nextInt(w), rnd.nextInt(h), rnd.nextInt())
      Seq("png", "jpg", "gif", "bmp").foreach { fmt =>
        val out = new java.io.ByteArrayOutputStream()
        assert(javax.imageio.ImageIO.write(img, fmt, out))
        val sniffed = graft.ext.ImageHeaders.sniff(out.toByteArray)
        assert(sniffed.exists(s => s._2 == w && s._3 == h), s"$fmt ${w}x$h -> $sniffed")
      }
    }
  }
}
