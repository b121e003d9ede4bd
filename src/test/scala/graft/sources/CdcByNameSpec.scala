package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.jobs.Snapshots

/** CDC streaming by NAME: the readChangeFeed option over a catalog
  * table widens the streaming schema with _op and replays commits as
  * row-level changes — no path or format string anywhere. */
class CdcByNameSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  test("readChangeFeed through readStream.table streams row-level changes") {
    val root = Files.createTempDirectory("cdct").toFile.getAbsolutePath + "/t"
    val cp = Files.createTempDirectory("cdct-cp").toFile.getAbsolutePath
    Snapshots.init(spark, root, Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
    Snapshots.mergeCow(spark, root, Seq((1L, 10.0)).toDF("k", "v"), Seq("k"),
      changeFeed = true)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = spark.readStream
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1")
      .table(s"graft.`$root`")
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select(col("k"), col(graft.jobs.ChangeFeed.opCol))
          .as[(Long, String)].collect().foreach(got.add); ()
      }
      .start()
    q.awaitTermination()
    val b = Seq.newBuilder[(Long, String)]; got.forEach(e => b += e)
    assert(b.result().toSet == Set(
      (1L, "insert"), (2L, "insert"),
      (1L, "update_preimage"), (1L, "update_postimage")),
      s"got: ${b.result()}")
  }

  test("startingVersion flows through readStream.table like any source option") {
    val root = Files.createTempDirectory("svt").toFile.getAbsolutePath + "/t"
    val cp = Files.createTempDirectory("svt-cp").toFile.getAbsolutePath
    Snapshots.init(spark, root, Seq((1L, 1.0)).toDF("k", "v"))       // v0
    Snapshots.append(spark, root, Seq((2L, 2.0)).toDF("k", "v"))     // v1
    Snapshots.append(spark, root, Seq((3L, 3.0)).toDF("k", "v"))     // v2
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.option("startingVersion", "1")
      .table(s"graft.`$root`")
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("k").as[Long].collect().foreach(got.add); ()
      }
      .start()
    q.awaitTermination()
    val b = Seq.newBuilder[Long]; got.forEach(e => b += e)
    assert(b.result().sorted == Seq(2L, 3L),
      "the name-door tail honors startingVersion (inclusive)")
  }
}
