package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Type widening (`alterColumnType` / `ALTER TABLE … ALTER COLUMN c
  * TYPE t`): ONE metadata commit, zero file rewrites — the vectorized
  * reader up-casts old files at scan time; narrower-typed producers
  * keep appending (ingest up-casts the batch). */
class TypeWideningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("twd").toFile.getAbsolutePath + "/t"

  test("int -> bigint widens as metadata; old files read, old producers append") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1 to 100).map(i => (i, i * 1.0)).toDF("k", "v")) // k is INT
    val filesBefore = Snapshots.versionFiles(spark, root).toSet
    val v = Snapshots.alterColumnType(spark, root, "k", LongType)
    assert(v == 1L)
    assert(Snapshots.versionFiles(spark, root).toSet == filesBefore,
      "zero rewrites — pure metadata")
    val df = Snapshots.readVersion(spark, root)
    assert(df.schema("k").dataType == LongType)
    assert(df.select(sum($"k")).as[Long].head() == 5050L)
    // a producer still emitting INT keeps working: the batch up-casts
    Snapshots.append(spark, root, Seq((101, 101.0)).toDF("k", "v"))
    assert(Snapshots.readVersion(spark, root).count() == 101)
    // a genuinely long value lands fine post-widen
    Snapshots.append(spark, root, Seq((5000000000L, 0.0)).toDF("k", "v"))
    assert(Snapshots.readVersion(spark, root)
      .select(max($"k")).as[Long].head() == 5000000000L)
    // integral stats envelopes stay valid across the widen: a range
    // predicate still file-prunes and returns exact rows
    assert(Snapshots.readVersion(spark, root).where($"k" <= 50).count() == 50)
  }

  test("float -> double and int -> decimal widen; narrowing refused") {
    val root = tmp()
    Snapshots.init(spark, root,
      Seq((1, 1.5f), (2, 2.5f)).toDF("k", "f"))
    Snapshots.alterColumnType(spark, root, "f", DoubleType)
    Snapshots.alterColumnType(spark, root, "k", DecimalType(12, 0))
    val df = Snapshots.readVersion(spark, root)
    assert(df.schema("f").dataType == DoubleType)
    assert(df.schema("k").dataType == DecimalType(12, 0))
    assert(df.select(sum($"f")).as[Double].head() == 4.0)
    intercept[IllegalArgumentException](
      Snapshots.alterColumnType(spark, root, "f", FloatType)) // narrowing
    intercept[IllegalArgumentException](
      Snapshots.alterColumnType(spark, root, "f", StringType)) // cross-family
    intercept[IllegalArgumentException](
      Snapshots.alterColumnType(spark, root, "nope", LongType))
  }

  test("the SQL door: ALTER TABLE ... ALTER COLUMN ... TYPE through the catalog") {
    val root = tmp()
    Snapshots.init(spark, root, (1 to 10).map(i => (i, s"r$i")).toDF("k", "s"))
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN k TYPE BIGINT")
    assert(Snapshots.readVersion(spark, root).schema("k").dataType == LongType)
    // partition columns refuse widening (path-typed at init)
    val proot = tmp()
    Snapshots.init(spark, proot,
      (1 to 20).map(i => (i, i % 2)).toDF("k", "p"),
      Map("graft.partitionBy" -> "p"))
    intercept[Exception](
      spark.sql(s"ALTER TABLE graft.`$proot` ALTER COLUMN p TYPE BIGINT"))
  }

  test("bucket columns refuse widening — Murmur3 bucket ids are type-width-bound") {
    // hashInt(5) != hashLong(5): widening a bucket column would leave
    // every existing file's bucket id computed under the OLD hash while
    // bucketSpecOf still advertises the bucketing — bucket pruning would
    // scan the wrong bucket (silently missing rows) and co-bucketed
    // joins would skip exchanges on a broken partitioning guarantee.
    val root = tmp()
    Snapshots.init(spark, root,
      (1 to 40).map(i => (i, i * 10)).toDF("k", "v"),
      Map("graft.bucketBy" -> "k", "graft.buckets" -> "4"))
    val e = intercept[IllegalArgumentException](
      Snapshots.alterColumnType(spark, root, "k", LongType))
    assert(e.getMessage.contains("bucket column"), e.getMessage)
    // the refusal is a no-op: no commit landed, table reads unchanged,
    // and bucket-keyed point lookups still return exact rows
    assert(Snapshots.latestVersion(spark, root) == 0L)
    assert(Snapshots.readVersion(spark, root).schema("k").dataType == IntegerType)
    assert(Snapshots.readVersion(spark, root).where($"k" === 7).count() == 1L)
    // NON-bucket columns on the same table still widen fine
    Snapshots.alterColumnType(spark, root, "v", LongType)
    assert(Snapshots.readVersion(spark, root).schema("v").dataType == LongType)
    assert(Snapshots.readVersion(spark, root).where($"k" === 7)
      .select($"v").as[Long].head() == 70L)
  }
}
