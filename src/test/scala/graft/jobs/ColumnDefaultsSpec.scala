package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Column DEFAULT values under the NOT-NULL-DEFAULT contract
  * (`addColumnDefault`): ONE metadata commit adds the column + its
  * constant; rows from files predating the declaration read the
  * constant (parquet null-fills them, every read path coalesces);
  * ingest injects absent columns and coalesces explicit NULLs;
  * rewrites materialize; the feature gates as `columnDefaults`. */
class ColumnDefaultsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("coldef").toFile.getAbsolutePath + "/t"

  test("declaration is metadata-only; every read path serves the constant") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(3))
    val filesBefore = Snapshots.versionFiles(spark, root).toSet
    Snapshots.addColumnDefault(spark, root, "tier", StringType, "'standard'")
    assert(Snapshots.versionFiles(spark, root).toSet == filesBefore,
      "zero rewrites — pure metadata")
    // pre-declaration rows read the constant, not NULL, on EVERY door
    val internal = Snapshots.readVersion(spark, root)
    assert(internal.where(col("tier").isNull).count() == 0)
    assert(internal.where(col("tier") === "standard").count() == 100)
    val source = spark.read.format("graft.sources.SnapshotSource").load(root)
    assert(source.where(col("tier") =!= "standard").count() == 0)
    assert(source.select(col("tier")).distinct().as[String].collect().toSeq
      == Seq("standard"))
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$root` WHERE tier = 'standard'")
      .head().getLong(0) == 100)
    // a filter on ANOTHER column composes (pushdown path unaffected)
    assert(source.where(col("k") <= 10).where(col("tier") === "standard")
      .count() == 10)
    // time travel: the pre-declaration version has no such column
    assert(!Snapshots.readVersion(spark, root, 0L).columns.contains("tier"))
    // the feature gates: reader AND writer lists carry columnDefaults
    val (_, _, rfeat, wfeat) = Snapshots.protocol(spark, root)
    assert(rfeat.contains("columnDefaults") && wfeat.contains("columnDefaults"))
  }

  test("ingest injects absent columns, coalesces NULLs, passes explicit values") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((1L, 1.0)).toDF("k", "v"))
    Snapshots.addColumnDefault(spark, root, "n", IntegerType, "7")
    Snapshots.append(spark, root, Seq((2L, 2.0)).toDF("k", "v")) // absent
    Snapshots.append(spark, root,
      Seq((3L, 3.0, null.asInstanceOf[Integer]), (4L, 4.0, Integer.valueOf(40)))
        .toDF("k", "v", "n")) // NULL + explicit
    val got = Snapshots.readVersion(spark, root)
      .select(col("k"), col("n")).as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 7, 2L -> 7, 3L -> 7, 4L -> 40), got.toString)
    // merge INSERT rows draw the default too
    Snapshots.mergeCow(spark, root, Seq((5L, 5.0)).toDF("k", "v"), Seq("k"))
    assert(Snapshots.readVersion(spark, root)
      .where(col("k") === 5L).select(col("n")).as[Int].head() == 7)
  }

  test("rewrites materialize the constant into the files") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 50L).map(i => (i, i * 1.0)).toDF("k", "v"))
    Snapshots.addColumnDefault(spark, root, "tag", StringType, "'x'")
    Snapshots.optimizeCompact(spark, root, 1L << 30, 1L << 30)
    // RAW parquet read (no engine read path): the value is physical now
    val raw = spark.read.parquet(Snapshots.versionFiles(spark, root): _*)
    assert(raw.columns.contains("tag"))
    assert(raw.where(col("tag").isNull).count() == 0 &&
      raw.where(col("tag") === "x").count() == 50,
      "OPTIMIZE materializes defaults")
  }

  test("composes with deletion vectors and the streaming tail") {
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 60L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(2))
    Snapshots.addColumnDefault(spark, root, "m", LongType, "99")
    Snapshots.deleteWhereMor(spark, root, "k % 10 = 0")
    val door = spark.read.format("graft.sources.SnapshotSource").load(root)
    assert(door.count() == 54)
    assert(door.where(col("m") =!= 99L).count() == 0,
      "defaults + DV anti-join compose on the front door")
    // plain streaming tail replays pre-declaration appends defaulted
    val sunk = tmp().stripSuffix("/t") + "/sink"
    val cp = tmp().stripSuffix("/t") + "/cp"
    spark.readStream.format("graft.sources.SnapshotSource")
      .option("skipRewrites", "true").load(root)
      .writeStream.format("parquet").option("path", sunk)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    val streamed = spark.read.parquet(sunk)
    assert(streamed.count() == 60, "the tail replays appended files (no DV)")
    assert(streamed.where(col("m").isNull).count() == 0,
      "streamed pre-declaration rows carry the default")
  }

  test("the SQL door: ALTER TABLE ... ADD COLUMN ... DEFAULT through the catalog") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
    spark.sql(s"ALTER TABLE graft.`$root` ADD COLUMN tier STRING DEFAULT 'basic'")
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$root` WHERE tier = 'basic'")
      .head().getLong(0) == 2L)
    spark.sql(s"INSERT INTO graft.`$root` VALUES (3, 3.0, 'pro')")
    assert(spark.sql(
      s"SELECT tier FROM graft.`$root` WHERE k = 3").head().getString(0) == "pro")
    // partial-column INSERT: the analyzer fills the default from the
    // schema's CURRENT_DEFAULT metadata (Spark's own mechanism)
    spark.sql(s"INSERT INTO graft.`$root` (k, v) VALUES (4, 4.0)")
    assert(spark.sql(
      s"SELECT tier FROM graft.`$root` WHERE k = 4").head().getString(0) == "basic")
    // and the DEFAULT keyword spells the same thing
    spark.sql(s"INSERT INTO graft.`$root` VALUES (5, 5.0, DEFAULT)")
    assert(spark.sql(
      s"SELECT tier FROM graft.`$root` WHERE k = 5").head().getString(0) == "basic")
  }

  test("DML predicates on a defaulted column hit pre-declaration rows") {
    // UPDATE/DELETE WHERE <defaulted-col> = <constant> must affect the
    // same rows SELECT with that predicate returns — including rows in
    // files written BEFORE the declaration (which physically null-fill)
    val root = tmp()
    Snapshots.init(spark, root,
      (1L to 20L).map(i => (i, i * 1.0)).toDF("k", "v").repartition(2))
    Snapshots.addColumnDefault(spark, root, "tier", StringType, "'standard'")
    // one post-declaration row with an explicit non-default value
    Snapshots.append(spark, root, Seq((21L, 21.0, "gold")).toDF("k", "v", "tier"))

    // COW UPDATE: victim selection must see the constant
    Snapshots.updateWhere(spark, root, Map("v" -> "v + 1000"),
      "tier = 'standard' AND k <= 5")
    val afterCow = Snapshots.readVersion(spark, root)
    assert(afterCow.where(col("v") > 999.0).count() == 5,
      "COW UPDATE on a defaulted predicate hits pre-declaration rows")

    // MOR UPDATE with CDC: SET referencing the defaulted column computes
    // from the constant, and update_preimage publishes it (never NULL)
    val updV = Snapshots.updateWhereMor(spark, root,
      Map("tier" -> "concat(tier, '+')"), "tier = 'standard' AND k IN (6, 7)",
      changeFeed = true)
    val head = Snapshots.readVersion(spark, root)
    assert(head.where(col("tier") === "standard+").count() == 2,
      "MOR SET computes from the declared constant, not NULL")
    val feed = Snapshots.changesBetween(spark, root, updV - 1, updV)
    val pre = feed.where(col("_op") === "update_preimage")
    assert(pre.count() == 2 && pre.where(col("tier").isNull).count() == 0 &&
      pre.where(col("tier") === "standard").count() == 2,
      "update_preimage publishes the constant for pre-declaration rows")

    // MOR DELETE: the predicate sees the constant; CDC delete rows too
    val delV = Snapshots.deleteWhereMor(spark, root,
      "tier = 'standard' AND k IN (8, 9)", changeFeed = true)
    assert(Snapshots.readVersion(spark, root).count() == 19)
    val delFeed = Snapshots.changesBetween(spark, root, delV - 1, delV)
      .where(col("_op") === "delete")
    assert(delFeed.count() == 2 &&
      delFeed.where(col("tier").isNull).count() == 0,
      "CDC delete rows carry the constant")

    // COW DELETE: doomed-file selection must see the constant
    Snapshots.deleteWhere(spark, root, "tier = 'standard' AND k = 10")
    assert(Snapshots.readVersion(spark, root).count() == 18)
    // the explicitly-'gold' row never matched any of the above
    assert(Snapshots.readVersion(spark, root)
      .where(col("k") === 21L).select(col("tier")).as[String].head() == "gold")
  }

  test("guards: constants only, non-null, immutable; widening composes") {
    val root = tmp()
    Snapshots.init(spark, root, Seq((1L, 1)).toDF("k", "w"))
    intercept[IllegalArgumentException](
      Snapshots.addColumnDefault(spark, root, "bad", DoubleType, "v * 2"))
    intercept[IllegalArgumentException](
      Snapshots.addColumnDefault(spark, root, "bad", StringType, "NULL"))
    Snapshots.addColumnDefault(spark, root, "d", IntegerType, "5")
    intercept[IllegalArgumentException](
      Snapshots.addColumnDefault(spark, root, "d", IntegerType, "6"))
    intercept[IllegalArgumentException](
      Snapshots.setProperties(spark, root, Map("graft.default.d" -> "int|9")))
    // widening the defaulted column: old constant casts up at read
    Snapshots.alterColumnType(spark, root, "d", LongType)
    assert(Snapshots.readVersion(spark, root)
      .select(col("d")).as[Long].head() == 5L)
    assert(spark.read.format("graft.sources.SnapshotSource").load(root)
      .select(col("d")).as[Long].head() == 5L)
  }
}
