package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.Snapshots

/** `table_changes('t', start [, end])` — CDC as a SQL table-valued
  * function (injectTableFunction): composes with the whole SQL surface,
  * version bounds inclusive on both ends, timestamps map through the
  * commit log, init/append versions synthesize insert rows. */
class TableChangesTvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("tvf").toFile.getAbsolutePath + "/t"

  private def crud(): String = {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 20L).map(i => (i, i * 1.0)).toDF("k", "v")) // v0
    Snapshots.mergeCow(spark, root,
      Seq((1L, 10.0), (21L, 21.0)).toDF("k", "v"), Seq("k"),
      changeFeed = true) // v1: update k=1, insert k=21
    Snapshots.deleteKeysCow(spark, root, Seq(2L).toDF("k"), Seq("k"),
      changeFeed = true) // v2: delete k=2
    root
  }

  test("per-op counts and commit versions over a CRUD range") {
    val root = crud()
    val ops = spark.sql(
      s"""SELECT _commit_version, _op, COUNT(*) AS n
         |FROM table_changes('graft.`$root`', 1, 2)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      .as[(Long, String, Long)].collect().toSeq
    assert(ops == Seq(
      (1L, "insert", 1L),
      (1L, "update_postimage", 1L),
      (1L, "update_preimage", 1L),
      (2L, "delete", 1L)))
    // the update pre/post pair carries the actual before/after values
    val pair = spark.sql(
      s"""SELECT _op, v FROM table_changes('graft.`$root`', 1, 1)
         |WHERE k = 1 ORDER BY _op""".stripMargin)
      .as[(String, Double)].collect().toSeq
    assert(pair == Seq(("update_postimage", 10.0), ("update_preimage", 1.0)))
  }

  test("version 0 reads as inserts; end omitted means head; SQL composes") {
    val root = crud()
    assert(spark.sql(
      s"SELECT COUNT(*) FROM table_changes('graft.`$root`', 0, 0)")
      .as[Long].head() == 20L, "init synthesizes insert rows")
    // start-only spans to the head (v2)
    assert(spark.sql(
      s"""SELECT COUNT(DISTINCT _commit_version)
         |FROM table_changes('graft.`$root`', 0)""".stripMargin)
      .as[Long].head() == 3L)
    // the TVF is a plain relation: joins/aggregates over it work
    val joined = spark.sql(
      s"""SELECT c._op, SUM(h.v) AS sv
         |FROM table_changes('graft.`$root`', 2, 2) c
         |JOIN graft.`$root` VERSION AS OF 0 h USING (k)
         |GROUP BY 1""".stripMargin).as[(String, Double)].collect().toSeq
    assert(joined == Seq(("delete", 2.0)))
  }

  test("timestamp bounds map through the commit log") {
    val root = crud()
    val t1 = new java.sql.Timestamp(Snapshots.commitTimestamp(spark, root, 1L))
    // start at v1's commit instant, end at head
    assert(spark.sql(
      s"""SELECT MIN(_commit_version) FROM table_changes('graft.`$root`', '$t1')""")
      .as[Long].head() == 1L)
  }

  test("bad arguments and unknown tables fail loudly") {
    val root = crud()
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM table_changes('graft.`$root`', 3, 1)").collect())
    assert(e1.getMessage.contains("empty version range"))
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM table_changes('no_such_table', 0)").collect())
    assert(e2.getMessage.contains("not a snapshot table"))
    val e3 = intercept[Exception](spark.sql(
      s"SELECT * FROM table_changes('graft.`$root`')").collect())
    assert(e3.getMessage.contains("table_changes expects"))
  }
}
