package graft.sources

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.Snapshots

/** The `spark.readStream` front door: tailing a snapshot-logged table as
  * a Structured Streaming source. Offsets are table versions; OPTIMIZE
  * commits are transparent; rewrites fail loudly unless admitted;
  * `maxFilesPerTrigger` paces micro-batches at commit grain. */
class SnapshotStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fmt = "graft.sources.SnapshotSource"

  private def dir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  /** Drain the stream AvailableNow through foreachBatch (the one test
    * sink that supports checkpoint recovery), collecting (batchRows,
    * batchCount) per micro-batch. */
  private def drain(src: DataFrame, cp: String,
                    sink: ConcurrentLinkedQueue[Seq[(Long, String)]]): Unit = {
    val q = src.writeStream
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        sink.add(df.as[(Long, String)].collect().toSeq): Unit
      }
      .start()
    q.awaitTermination()
  }

  private def one(rows: (Long, String)*): DataFrame =
    rows.toDF("k", "s").coalesce(1)

  test("AvailableNow drains the whole log; a restarted run picks up only new commits") {
    val root = dir("sstail") + "/t"
    val cp = dir("sstail-cp")
    Snapshots.init(spark, root, one(1L -> "a", 2L -> "b"))
    Snapshots.append(spark, root, one(3L -> "c"))
    val got1 = new ConcurrentLinkedQueue[Seq[(Long, String)]]()
    drain(spark.readStream.format(fmt).load(root), cp, got1)
    assert(got1.asScala().flatten.toSet == Set(1L -> "a", 2L -> "b", 3L -> "c"))

    Snapshots.append(spark, root, one(4L -> "d"))
    val got2 = new ConcurrentLinkedQueue[Seq[(Long, String)]]()
    drain(spark.readStream.format(fmt).load(root), cp, got2)
    assert(got2.asScala().flatten.toSet == Set(4L -> "d"),
      "a resumed tail must replay nothing already committed")
  }

  test("OPTIMIZE commits are transparent: no double-counted rows") {
    val root = dir("ssopt") + "/t"
    val cp = dir("ssopt-cp")
    Snapshots.init(spark, root, one(1L -> "a"))
    Snapshots.append(spark, root, one(2L -> "b"))
    assert(Snapshots.optimizeCompact(spark, root, smallerThanBytes = 10L * 1024 * 1024) >= 0)
    Snapshots.append(spark, root, one(3L -> "c"))
    val got = new ConcurrentLinkedQueue[Seq[(Long, String)]]()
    drain(spark.readStream.format(fmt).load(root), cp, got)
    val rows = got.asScala().flatten.toSeq
    assert(rows.size == 3, s"optimize adds must not re-enter the tail: $rows")
    assert(rows.toSet == Set(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("a rewrite commit fails the stream loudly; skipRewrites admits the history") {
    val root = dir("ssrw") + "/t"
    Snapshots.init(spark, root, one(1L -> "a", 2L -> "b"))
    Snapshots.deleteKeysCow(spark, root, Seq(Tuple1(1L)).toDF("k"), Seq("k"))
    Snapshots.append(spark, root, one(3L -> "c"))

    val loud = intercept[StreamingQueryException] {
      val got = new ConcurrentLinkedQueue[Seq[(Long, String)]]()
      drain(spark.readStream.format(fmt).load(root), dir("ssrw-cp1"), got)
    }
    assert(Iterator.iterate(loud: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.getMessage != null && loud.toString.contains("rewrite") ||
        Option(loud.getMessage).exists(_.contains("rewrite"))),
      s"failure must name the rewrite: $loud")

    val got = new ConcurrentLinkedQueue[Seq[(Long, String)]]()
    drain(spark.readStream.format(fmt).option("skipRewrites", "true").load(root),
      dir("ssrw-cp2"), got)
    // inserts-only admission: the delete's rewrite is skipped wholesale,
    // so the tail sees the ORIGINAL inserts plus later appends
    assert(got.asScala().flatten.toSet == Set(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("maxFilesPerTrigger paces micro-batches at commit grain") {
    val root = dir("sspace") + "/t"
    val cp = dir("sspace-cp")
    Snapshots.init(spark, root, one(1L -> "a"))
    (2L to 5L).foreach(i => Snapshots.append(spark, root, one(i -> s"r$i")))
    val got = new ConcurrentLinkedQueue[Seq[(Long, String)]]()
    drain(spark.readStream.format(fmt).option("maxFilesPerTrigger", "1").load(root), cp, got)
    val batches = got.asScala()
    assert(batches.size == 5, s"one 1-file commit per trigger: ${batches.size} batches")
    assert(batches.flatten.toSet ==
      (1L to 5L).map(i => i -> (if (i == 1L) "a" else s"r$i")).toSet)
  }

  test("readChangeFeed streams row-level changes: inserts synthesized, rewrites replayed") {
    val root = dir("sscdf") + "/t"
    val cp = dir("sscdf-cp")
    Snapshots.init(spark, root, one(1L -> "a", 2L -> "b"))                 // v0: inserts
    Snapshots.mergeCow(spark, root, one(2L -> "B", 3L -> "c"),
      Seq("k"), changeFeed = true)                                          // v1: update + insert
    Snapshots.deleteKeysCow(spark, root, Seq(Tuple1(1L)).toDF("k"),
      Seq("k"), changeFeed = true)                                          // v2: delete

    val src = spark.readStream.format(fmt).option("readChangeFeed", "true").load(root)
    assert(src.columns.contains("_op"))
    // the streaming CDF carries the same metadata as the batch TVF
    assert(src.columns.contains("_commit_version") &&
      src.columns.contains("_commit_timestamp"))
    val got = new ConcurrentLinkedQueue[Seq[(Long, String, String, Long, Long)]]()
    val q = src.writeStream
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        got.add(df.select(col("k"), col("s"), col("_op"),
            col("_commit_version"), unix_millis(col("_commit_timestamp")))
          .as[(Long, String, String, Long, Long)].collect().toSeq): Unit
      }
      .start()
    q.awaitTermination()
    val rows = { val b = Seq.newBuilder[(Long, String, String, Long, Long)]; got.forEach(e => b ++= e); b.result() }
    val changes = rows.map(r => (r._1, r._2, r._3))
    assert(changes.toSet == Set(
      (1L, "a", "insert"), (2L, "b", "insert"),
      (2L, "b", "update_preimage"), (2L, "B", "update_postimage"), (3L, "c", "insert"),
      (1L, "a", "delete")), s"full CRUD feed expected: $changes")
    // versions stamp per commit; timestamps are the in-commit headers
    assert(rows.map(r => (r._3, r._4)).toSet == Set(
      ("insert", 0L), ("update_preimage", 1L), ("update_postimage", 1L),
      ("insert", 1L), ("delete", 2L)), rows.toString)
    rows.foreach { r =>
      assert(r._5 == Snapshots.commitTimestamp(spark, root, r._4),
        s"v${r._4} row must carry its commit's in-commit timestamp")
    }

    // a resumed CDC tail replays nothing
    Snapshots.append(spark, root, one(4L -> "d"))                           // v3: insert
    val got2 = new ConcurrentLinkedQueue[Seq[(Long, String, String)]]()
    val q2 = spark.readStream.format(fmt).option("readChangeFeed", "true").load(root)
      .writeStream.option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        got2.add(df.select(col("k"), col("s"), col("_op"))
          .as[(Long, String, String)].collect().toSeq): Unit
      }
      .start()
    q2.awaitTermination()
    val tail = { val b = Seq.newBuilder[(Long, String, String)]; got2.forEach(e => b ++= e); b.result() }
    assert(tail.toSet == Set((4L, "d", "insert")))
  }

  test("readChangeFeed refuses the contradictory options") {
    val root = dir("sscdf-bad") + "/t"
    Snapshots.init(spark, root, one(1L -> "a"))
    def messagesOf(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .flatMap(e => Option(e.getMessage)).toSeq
    def start(extra: (String, String)): Seq[String] = messagesOf(intercept[Throwable] {
      val q = spark.readStream.format(fmt)
        .option("readChangeFeed", "true").option(extra._1, extra._2).load(root)
        .writeStream.option("checkpointLocation", dir("sscdf-bad-cp"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch((_: DataFrame, _: Long) => ()).start()
      q.awaitTermination()
    })
    assert(start("skipRewrites" -> "true").exists(_.contains("skipRewrites")))
    assert(start("maxFilesPerTrigger" -> "2").exists(_.contains("maxFilesPerTrigger")))
  }

  test("maxBytesPerTrigger paces micro-batches at commit grain too") {
    val root = dir("ssbytes") + "/t"
    val cp = dir("ssbytes-cp")
    Snapshots.init(spark, root, one(1L -> "a"))
    (2L to 4L).foreach(i => Snapshots.append(spark, root, one(i -> s"r$i")))
    val got = new ConcurrentLinkedQueue[Seq[(Long, String)]]()
    // 1-byte cap: every commit alone exceeds it, so each is its own batch
    drain(spark.readStream.format(fmt).option("maxBytesPerTrigger", "1").load(root), cp, got)
    val batches = got.asScala()
    assert(batches.size == 4, s"one commit per trigger under a 1-byte cap: ${batches.size}")
    assert(batches.flatten.toSet ==
      (1L to 4L).map(i => i -> (if (i == 1L) "a" else s"r$i")).toSet)
  }

  test("maxVersionsPerTrigger paces at commit grain, including the CDC mode") {
    val root = dir("ssmaxv") + "/t"
    val cp = dir("ssmaxv-cp")
    Snapshots.init(spark, root, one(1L -> "a"))
    (2L to 4L).foreach(i => Snapshots.append(spark, root, one(i -> s"r$i")))
    val got = new ConcurrentLinkedQueue[Seq[(Long, String)]]()
    drain(spark.readStream.format(fmt).option("maxVersionsPerTrigger", "1").load(root), cp, got)
    val batches = got.asScala()
    assert(batches.size == 4, s"one commit per trigger: got ${batches.size}")
    assert(batches.flatten.toSet ==
      (1L to 4L).map(i => i -> (if (i == 1L) "a" else s"r$i")).toSet)
    // CDC mode accepts the commit-grain knob (file/byte caps stay refused)
    val root2 = dir("ssmaxv2") + "/t"
    Snapshots.init(spark, root2, one(1L -> "a"))
    Snapshots.mergeCow(spark, root2, one(1L -> "A"), Seq("k"), changeFeed = true)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format(fmt)
      .option("readChangeFeed", "true").option("maxVersionsPerTrigger", "1").load(root2)
      .writeStream.option("checkpointLocation", dir("ssmaxv2-cp"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: DataFrame, id: Long) => { seen.add(b.count()); () })
      .start()
    q.awaitTermination()
    val counts = { val b = Seq.newBuilder[Long]; seen.forEach(e => b += e); b.result() }
    assert(counts == Seq(1L, 2L),
      s"v0 inserts then the merge's pre+post images, one commit per batch: $counts")
  }

  test("startingVersion tails from the named version inclusive (Delta convention)") {
    val root = dir("ssfrom") + "/t"
    val cp = dir("ssfrom-cp")
    Snapshots.init(spark, root, one(1L -> "a"))      // v0
    Snapshots.append(spark, root, one(2L -> "b"))    // v1
    Snapshots.append(spark, root, one(3L -> "c"))    // v2
    val got = new ConcurrentLinkedQueue[Seq[(Long, String)]]()
    drain(spark.readStream.format(fmt).option("startingVersion", "2").load(root), cp, got)
    assert(got.asScala().flatten.toSet == Set(3L -> "c"))
    val got1 = new ConcurrentLinkedQueue[Seq[(Long, String)]]()
    drain(spark.readStream.format(fmt).option("startingVersion", "1").load(root),
      dir("ssfrom-cp1"), got1)
    assert(got1.asScala().flatten.toSet == Set(2L -> "b", 3L -> "c"))
  }

  test("startingTimestamp resolves to the same tail as the equivalent startingVersion") {
    val root = dir("ssts") + "/t"
    Snapshots.init(spark, root, one(1L -> "a"))      // v0
    Snapshots.append(spark, root, one(2L -> "b"))    // v1
    Snapshots.append(spark, root, one(3L -> "c"))    // v2
    val tsV1 = Snapshots.commitTimestamp(spark, root, 1L)
    // anchored exactly at v1's commit: v1 is the first version at-or-after
    val got = new ConcurrentLinkedQueue[Seq[(Long, String)]]()
    drain(spark.readStream.format(fmt).option("startingTimestamp", tsV1.toString)
      .load(root), dir("ssts-cp"), got)
    assert(got.asScala().flatten.toSet == Set(2L -> "b", 3L -> "c"),
      "timestamp start streams the same change set as startingVersion=1")
    // a timestamp past the last commit starts an EMPTY tail, then emits
    // future commits
    val gotF = new ConcurrentLinkedQueue[Seq[(Long, String)]]()
    val cpF = dir("ssts-cpf")
    drain(spark.readStream.format(fmt)
      .option("startingTimestamp", (Snapshots.commitTimestamp(spark, root, 2L) + 1).toString)
      .load(root), cpF, gotF)
    assert(gotF.asScala().flatten.isEmpty, "nothing committed at-or-after the anchor yet")
    Snapshots.append(spark, root, one(4L -> "d"))    // v3, after the anchor
    drain(spark.readStream.format(fmt)
      .option("startingTimestamp", (Snapshots.commitTimestamp(spark, root, 2L) + 1).toString)
      .load(root), cpF, gotF)
    assert(gotF.asScala().flatten.toSet == Set(4L -> "d"))
    // both spellings at once is refused
    intercept[Exception] {
      spark.readStream.format(fmt).option("startingVersion", "1")
        .option("startingTimestamp", "0").load(root)
        .writeStream.option("checkpointLocation", dir("ssts-cpx"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch((_: DataFrame, _: Long) => ()).start().awaitTermination()
    }
  }

  private implicit class QueueOps(q: ConcurrentLinkedQueue[Seq[(Long, String)]]) {
    def asScala(): Seq[Seq[(Long, String)]] = {
      val b = Seq.newBuilder[Seq[(Long, String)]]
      q.forEach(e => b += e)
      b.result()
    }
  }
}
