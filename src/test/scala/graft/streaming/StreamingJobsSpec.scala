package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class StreamingJobsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("windowed aggregation over AvailableNow file stream matches batch result") {
    // stream the events table (write a clean copy with proper micros ts first,
    // since streaming sources need a plain schema)
    val dir = java.nio.file.Files.createTempDirectory("stream-src").toString
    Tables.events(spark, TestSpark.sfDir).write.mode("overwrite").parquet(dir)

    // Complete mode: the memory sink holds every window, so the comparison is
    // exact regardless of how AvailableNow splits micro-batches (append mode
    // would drop rows arriving behind the advancing watermark — correct
    // streaming semantics, but not a batch-parity check).
    val stream = StreamingJobs.eventsStream(spark, dir)
    val q = StreamingJobs.runAvailableNow(
      StreamingJobs.windowedCounts(stream), "win_counts", OutputMode.Complete)
    q.stop()

    val streamed = spark.sql("SELECT event_type, SUM(n) AS n FROM win_counts GROUP BY event_type")
    val batch = Tables.events(spark, TestSpark.sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val a = streamed.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = batch.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("tableStream reads BOTH table layouts: single file and partitioned directory tree") {
    import spark.implicits._
    // layout A — the test-data shape: events.parquet is a single FILE
    // inside the sf dir (glob-filtered parent stream)
    val fileDir = java.nio.file.Files.createTempDirectory("ts-file").toString
    val rows = (1L to 300L).map(i => (i, i % 7, s"t${i % 3}", i * 1.0))
    val df = rows.toDF("event_id", "user_id", "event_type", "value")
    df.coalesce(1).write.parquet(s"$fileDir/stage")
    val part = new java.io.File(s"$fileDir/stage").listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$fileDir/events.parquet"))
    val a = StreamingJobs.runAvailableNow(
      StreamingJobs.tableStream(spark, fileDir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n")), "ts_file", OutputMode.Complete())
    a.stop()
    // layout B — any Spark-written table (the 10x scale corpora): a
    // PARTITIONED directory tree under events.parquet/ (the shape the
    // pathGlobFilter-only source silently matched nothing on)
    val dirDir = java.nio.file.Files.createTempDirectory("ts-dir").toString
    df.write.partitionBy("event_type").parquet(s"$dirDir/events.parquet")
    val b = StreamingJobs.runAvailableNow(
      StreamingJobs.tableStream(spark, dirDir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n")), "ts_dir", OutputMode.Complete())
    b.stop()
    val expected = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    def got(t: String) = spark.table(t).as[(String, Long)].collect().toMap
    assert(got("ts_file") == expected, "file layout must stream every row")
    assert(got("ts_dir") == expected, "directory layout must stream every row")
  }

  test("streaming ETL to parquet sink equals the batch transform (incl. restart idempotence)") {
    val src = java.nio.file.Files.createTempDirectory("setl-src").toString
    val out = java.nio.file.Files.createTempDirectory("setl-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("setl-ckpt").toString
    Tables.events(spark, TestSpark.sfDir).write.mode("overwrite").parquet(src)

    StreamingJobs.etlStream(spark, src, out, ckpt)
    val streamed = spark.read.parquet(out)
    val batch = graft.etl.Features.withTemporal(
      Tables.events(spark, TestSpark.sfDir)
        .filter(col("value") > 0 && col("ts").isNotNull), "ts", "event")
    assert(streamed.count() == batch.count())
    assert(streamed.columns.sorted.sameElements(batch.columns.sorted))
    // re-run with the same checkpoint: no new files -> no duplicate rows
    StreamingJobs.etlStream(spark, src, out, ckpt)
    assert(spark.read.parquet(out).count() == batch.count())
  }

  test("mapGroupsWithState sessionization emits per-user running totals") {
    val dir = java.nio.file.Files.createTempDirectory("stream-src2").toString
    Tables.events(spark, TestSpark.sfDir).limit(500).write.mode("overwrite").parquet(dir)

    val stream = StreamingJobs.eventsStream(spark, dir)
    val q = StreamingJobs.sessionize(spark, stream)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()

    val out = spark.sql("SELECT COUNT(DISTINCT user_id) FROM sessions").head.getLong(0)
    assert(out > 0)
  }

  test("sliding windows double-count each event; session windows match batch session count") {
    val dir = java.nio.file.Files.createTempDirectory("stream-win2").toString
    val events = Tables.events(spark, TestSpark.sfDir).limit(5000)
    events.write.mode("overwrite").parquet(dir)

    // sliding 1h-every-30min: every event falls in exactly 2 windows
    val q1 = StreamingJobs.runAvailableNow(
      StreamingJobs.slidingCounts(StreamingJobs.eventsStream(spark, dir)),
      "slide_counts", OutputMode.Complete)
    q1.stop()
    val slideTotal = spark.sql("SELECT SUM(n) FROM slide_counts").head.getLong(0)
    assert(slideTotal == 2 * events.count())

    // gap-based session windows: streaming result equals the same
    // session_window aggregation run in batch
    val q2 = StreamingJobs.runAvailableNow(
      StreamingJobs.sessionWindows(StreamingJobs.eventsStream(spark, dir)),
      "sess_win", OutputMode.Complete)
    q2.stop()
    val streamed = spark.sql("SELECT COUNT(*) FROM sess_win").head.getLong(0)
    val batch = events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1))).count()
    assert(streamed == batch && streamed > 0)
  }

  test("streaming dedup drops replayed records within the watermark") {
    // source with every event duplicated (an at-least-once replay)
    val dir = java.nio.file.Files.createTempDirectory("stream-dedup").toString
    val events = Tables.events(spark, TestSpark.sfDir).limit(2000)
    events.union(events).write.mode("overwrite").parquet(dir)

    val stream = StreamingJobs.eventsStream(spark, dir)
    val q = StreamingJobs.runAvailableNow(
      StreamingJobs.dedupStream(stream), "dedup_stream", OutputMode.Append)
    q.stop()

    val deduped = spark.sql("SELECT COUNT(*) FROM dedup_stream").head.getLong(0)
    assert(deduped == events.count())
    assert(spark.read.parquet(dir).count() == 2 * events.count())
  }

  test("stream-static enrichment join decodes against a static dim per micro-batch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream-enrich").toString
    val events = Tables.events(spark, TestSpark.sfDir).limit(1000)
    events.write.mode("overwrite").parquet(dir)
    val dim = events.select("event_type").distinct()
      .withColumn("etiqueta", concat(lit("tipo:"), col("event_type")))

    val stream = StreamingJobs.eventsStream(spark, dir)
    val q = StreamingJobs.runAvailableNow(
      StreamingJobs.enrichStream(stream, dim, Seq("event_type")), "enriched", OutputMode.Append)
    q.stop()

    val enriched = spark.table("enriched")
    assert(enriched.count() == events.count())
    assert(enriched.filter(col("etiqueta").isNull || !col("etiqueta").startsWith("tipo:")).isEmpty)
  }
}
