package graft.jobs

import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Concurrency gauntlet (r11, VERDICT task 7): the choreographed
  * two-writer OCC specs prove the protocol's STEPS; this spec proves
  * the protocol under REAL races — N uncoordinated threads hammering
  * ONE table with appends, whole-row merges, compaction, MOR deletes,
  * DV materialization and vacuum for a fixed wall-clock window, then
  * four invariants over the wreckage:
  *
  *   1. VERSIONS LINEAR — the surviving log is a gap-free integer
  *      range (every OCC winner claimed exactly predecessor+1; vacuum
  *      only trims a prefix);
  *   2. NO LOST ROWS — every committed append batch's key set is
  *      present at head (appends rebase; rewrite commits rebase or
  *      lose LOUDLY — a silent overwrite would drop keys);
  *   3. NO TORN LOG — the head (and every surviving version) reads
  *      cleanly; write-time stats cover every live file;
  *   4. VACUUM SAFETY — no file referenced by any surviving version
  *      was deleted (reads above prove it by not throwing).
  *
  * Key-space discipline makes invariant 2 checkable: appenders own
  * disjoint ranges ≥ 1,000,000; the merger upserts only 10,000-10,099;
  * the MOR deleter only touches keys < 1,000. */
class ConcurrencyStressSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stormMillis = 8000L

  test("uncoordinated append/merge/compact/MOR-delete/materialize/vacuum keep every invariant") {
    val root = Files.createTempDirectory("storm").toFile.getAbsolutePath + "/t"
    Snapshots.init(spark, root,
      ((0L until 1000L) ++ (20000L until 20100L))
        .map(i => (i, i * 1.0)).toDF("k", "v").repartition(2))

    val stop = new AtomicBoolean(false)
    val committedBatches = new ConcurrentLinkedQueue[Long]() // batch ids whose appends committed
    val nextBatch = new AtomicLong(0L)
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val raceLosses = new AtomicLong(0L)

    def guard(body: => Unit): Unit =
      try body
      catch {
        // a LOUD OCC loss is the protocol WORKING: lost publish races
        // ("commit race") and rewrite/DV reconciliation refusals
        // ("rewrite conflict … recompute against the current version")
        // are the documented retry signals — anything else is a bug
        case e: IllegalArgumentException if e.getMessage != null &&
            (e.getMessage.contains("commit race") ||
              e.getMessage.contains("nothing to do")) =>
          raceLosses.incrementAndGet()
        case e: IllegalStateException if e.getMessage != null &&
            e.getMessage.contains("rewrite conflict") =>
          raceLosses.incrementAndGet()
        case e: Throwable => failures.add(e)
      }

    val pool = Executors.newFixedThreadPool(6)
    val done = new CountDownLatch(6)
    def worker(body: => Unit): Unit = pool.submit(new Runnable {
      override def run(): Unit = {
        try while (!stop.get()) body
        finally done.countDown()
      }
    })

    // two appenders: disjoint batch key ranges, 50 keys per batch
    for (_ <- 0 until 2) worker {
      val b = nextBatch.getAndIncrement()
      val lo = 1000000L + b * 50L
      guard {
        Snapshots.append(spark, root,
          (lo until lo + 50L).map(i => (i, i * 0.5)).toDF("k", "v"))
        committedBatches.add(b) // recorded ONLY if the commit returned
      }
    }
    // merger: upserts a fixed small band (rewrite commit — rebases or loses loudly)
    worker {
      guard {
        Snapshots.mergeCow(spark, root,
          (10000L until 10100L).map(i => (i, i * 2.0)).toDF("k", "v"), Seq("k"))
      }
    }
    // maintainer: compaction and (rarely) version-grain vacuum of a deep prefix
    val maintRound = new AtomicLong(0L)
    worker {
      val r = maintRound.getAndIncrement()
      guard {
        if (r % 5 == 4) {
          // deep margin: an in-flight rewrite pinned a recent version;
          // trimming far below the head mirrors the retention-window
          // discipline production vacuum enforces
          val head = Snapshots.latestVersion(spark, root)
          if (head > 20) Snapshots.vacuum(spark, root, head - 15)
        } else
          Snapshots.optimizeCompact(spark, root,
            smallerThanBytes = 64L * 1024, targetFileBytes = 1024L * 1024)
      }
    }
    // MOR updater: deletion-vector UPDATE of its own band (idempotent
    // SET, so whenever it EVER won the band must read k*10) — its
    // dvAdd commits race the compactor/materializer through the full
    // DV + props reconciliation
    val updaterWon = new AtomicBoolean(false)
    worker {
      guard {
        Snapshots.updateWhereMor(spark, root,
          Map("v" -> "k * 10"), "k >= 20000 AND k < 20100")
        updaterWon.set(true)
      }
    }
    // MOR deleter + materializer on the base range only
    val delRound = new AtomicLong(0L)
    worker {
      val r = delRound.getAndIncrement()
      guard {
        if (r % 3 == 2) Snapshots.materializeDeletionVectors(spark, root)
        else {
          val lo = (r * 7) % 900
          Snapshots.deleteWhereMor(spark, root, s"k >= $lo AND k < ${lo + 5}")
        }
      }
    }

    Thread.sleep(stormMillis)
    stop.set(true)
    assert(done.await(120, TimeUnit.SECONDS), "storm workers failed to drain")
    pool.shutdown()

    val firstFailure = Option(failures.peek()).map(e =>
      s"unexpected failure under the storm (${failures.size} total): " +
        s"${e.getClass.getName}: ${e.getMessage}\n" +
        e.getStackTrace.take(12).mkString("\n")).getOrElse("")
    assert(failures.isEmpty, firstFailure)

    // 1. versions linear: the surviving log is a gap-free range
    val vs = Snapshots.versions(spark, root)
    assert(vs.nonEmpty)
    assert(vs == (vs.min to vs.max), s"log has gaps: $vs")
    assert(vs.max >= 5, s"the storm should have committed real work, head=${vs.max}")

    // 2+3. head reads cleanly; every committed append batch's keys present
    val head = Snapshots.readVersion(spark, root)
    val appendedKeys = head.where(col("k") >= 1000000L)
      .select(col("k")).as[Long].collect().toSet
    val batches = committedBatches.asScala.toSeq
    batches.foreach { b =>
      val lo = 1000000L + b * 50L
      (lo until lo + 50L).foreach(k =>
        assert(appendedKeys.contains(k),
          s"append batch $b committed but key $k is MISSING at head (lost commit)"))
    }
    // merged band: whenever the merger ever won, the upserted values hold
    val merged = head.where(col("k") >= 10000L && col("k") < 10100L)
      .select(col("k"), col("v")).as[(Long, Double)].collect()
    merged.foreach { case (k, v) => assert(v == k * 2.0) }
    // MOR-updated band: idempotent SET — any committed update pins it
    if (updaterWon.get()) {
      val band = head.where(col("k") >= 20000L && col("k") < 20100L)
        .select(col("k"), col("v")).as[(Long, Double)].collect()
      assert(band.length == 100, s"band lost rows: ${band.length}")
      band.foreach { case (k, v) => assert(v == k * 10.0,
        s"MOR update committed but k=$k reads v=$v (lost update or resurrected pre-image)") }
    }
    // stats cover every live file (no torn/partial commit metadata)
    assert(Snapshots.statsMissingFromLog(spark, root).isEmpty)

    // 4. vacuum never deleted a referenced file: every surviving version reads
    vs.foreach { v =>
      val n = Snapshots.readVersion(spark, root, v).count()
      assert(n >= 0L) // the read itself (file access) is the assertion
    }
    assert(raceLosses.get() + batches.size > 0, "storm ran")
  }

  test("bucketed storm: REBUCKET and DROP FEATURE race ingest without desync") {
    // the r12 bucket-widening bug class, now at the COUNT axis: a
    // REBUCKET rebasing over a concurrent append would leave that
    // append's files stamped under the OLD count while head props claim
    // the new one — bucketed planning (zero-exchange joins, bucket
    // pruning) would silently misplace its rows. The engine refuses the
    // rebase (commitRewrite's layout guard) and appends re-stamp + retry
    // (commitAdds' bucket-layout guard); this storm proves the guards
    // hold under real races, then checks the STRONGEST end invariant:
    // every live row's murmur3 bucket under the head's count equals its
    // file's stamped id.
    val root = Files.createTempDirectory("bstorm").toFile.getAbsolutePath + "/t"
    Snapshots.init(spark, root,
      (0L until 1000L).map(i => (i, i * 1.0)).toDF("k", "v"),
      Map("graft.bucketBy" -> "k", "graft.buckets" -> "4"))

    val stop = new AtomicBoolean(false)
    val committedBatches = new ConcurrentLinkedQueue[Long]()
    val nextBatch = new AtomicLong(0L)
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val raceLosses = new AtomicLong(0L)
    val drops = new AtomicLong(0L)

    def guard(body: => Unit): Unit =
      try body
      catch {
        case e: IllegalArgumentException if e.getMessage != null &&
            (e.getMessage.contains("commit race") ||
              e.getMessage.contains("nothing to do") ||
              // DROP FEATURE's legitimate refusals under the race:
              // vectors went live again / already dropped / rebase
              // would resurrect
              e.getMessage.contains("materializeDeletionVectors") ||
              e.getMessage.contains("does not carry feature") ||
              e.getMessage.contains("cannot drop feature")) =>
          raceLosses.incrementAndGet()
        case e: IllegalStateException if e.getMessage != null &&
            (e.getMessage.contains("rewrite conflict") ||
              e.getMessage.contains("bucket layout race")) =>
          raceLosses.incrementAndGet()
        case e: Throwable => failures.add(e)
      }

    val pool = Executors.newFixedThreadPool(5)
    val done = new CountDownLatch(5)
    def worker(body: => Unit): Unit = pool.submit(new Runnable {
      override def run(): Unit = {
        try while (!stop.get()) body
        finally done.countDown()
      }
    })

    for (_ <- 0 until 2) worker {
      val b = nextBatch.getAndIncrement()
      val lo = 1000000L + b * 50L
      guard {
        Snapshots.append(spark, root,
          (lo until lo + 50L).map(i => (i, i * 0.5)).toDF("k", "v"))
        committedBatches.add(b)
      }
    }
    // the REBUCKET writer: bucket-count evolution racing everything
    val rebucketRound = new AtomicLong(0L)
    worker {
      val r = rebucketRound.getAndIncrement()
      guard(Snapshots.rebucket(spark, root, if (r % 2 == 0) 8 else 4))
    }
    // MOR deleter + materializer (DV churn the dropper races against)
    val delRound = new AtomicLong(0L)
    worker {
      val r = delRound.getAndIncrement()
      guard {
        if (r % 3 == 2) Snapshots.materializeDeletionVectors(spark, root)
        else {
          val lo = (r * 7) % 900
          Snapshots.deleteWhereMor(spark, root, s"k >= $lo AND k < ${lo + 3}")
        }
      }
    }
    // the DROP FEATURE writer: protocol downgrade racing DV churn
    worker {
      guard {
        Snapshots.materializeDeletionVectors(spark, root)
        Snapshots.dropFeature(spark, root, "deletionVectors")
        drops.incrementAndGet()
      }
    }

    Thread.sleep(stormMillis)
    stop.set(true)
    assert(done.await(120, TimeUnit.SECONDS), "storm workers failed to drain")
    pool.shutdown()

    val firstFailure = Option(failures.peek()).map(e =>
      s"unexpected failure under the bucketed storm (${failures.size} total): " +
        s"${e.getClass.getName}: ${e.getMessage}\n" +
        e.getStackTrace.take(12).mkString("\n")).getOrElse("")
    assert(failures.isEmpty, firstFailure)

    val vs = Snapshots.versions(spark, root)
    assert(vs == (vs.min to vs.max), s"log has gaps: $vs")

    // committed appends all present
    val head = Snapshots.readVersion(spark, root)
    val appendedKeys = head.where(col("k") >= 1000000L)
      .select(col("k")).as[Long].collect().toSet
    committedBatches.asScala.foreach { b =>
      val lo = 1000000L + b * 50L
      (lo until lo + 50L).foreach(k =>
        assert(appendedKeys.contains(k), s"append batch $b lost key $k"))
    }

    // THE layout invariant: after folding any DVs away, every live
    // row's bucket under the HEAD count matches its file's stamped id —
    // a stale-stamped survivor of a count flip cannot hide (half its
    // rows would land in the wrong bucket)
    Snapshots.materializeDeletionVectors(spark, root)
    val c = Snapshots.tableProperties(spark, root)("graft.buckets").toInt
    val placed = spark.read.parquet(Snapshots.versionFiles(spark, root): _*)
      .select(col("k"), pmod(hash(col("k")), lit(c)).as("expected"),
        col("_metadata.file_path").as("p"))
      .as[(Long, Int, String)].collect()
    assert(placed.nonEmpty)
    placed.foreach { case (k, expected, p) =>
      val name = p.substring(p.lastIndexOf('/') + 1)
      val id = org.apache.spark.sql.execution.datasources.BucketingUtils
        .getBucketId(name)
        .getOrElse(fail(s"live file lost its bucket stamp: $name"))
      assert(id == expected,
        s"k=$k expects bucket $expected of $c but sits in bucket $id ($name) — " +
          "a stale-stamped file survived a REBUCKET race")
    }

    // protocol coherent: vectors live ⇒ feature present; dropper's
    // successes never left a live vector ungated
    val (_, _, rfeat, _) = Snapshots.protocol(spark, root)
    if (Snapshots.liveDeletionVectors(spark, root).nonEmpty)
      assert(rfeat.contains("deletionVectors"))
    assert(raceLosses.get() + committedBatches.size + drops.get() > 0, "storm ran")
  }
}
