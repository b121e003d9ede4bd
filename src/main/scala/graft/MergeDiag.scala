package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Dumps, Tables}
import graft.jobs.{Snapshots, SnapshotSql}

/** Diagnostic main for the `sql_merge_clauses` scale profile (VERDICT
  * r10 task 5: 4.53 → 10.19 s at 10× = 2.25×, the one >2× scale row).
  * The registry query executes FOUR heavyweight stages — the API clause
  * merge, the SQL clause merge, and TWO full-table multiset-equality
  * diffs (heads + change feeds) that prove SQL ≡ API — plus the final
  * aggregate. This main times each stage separately at the given SF so
  * the superlinearity can be attributed to the OPERATOR or to the
  * PROOF.
  *
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.MergeDiag"
  */
object MergeDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.sources.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[mergediag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val rootA = s"${Dumps.forSf(sfDir)}/diag_clauseapi"
    val rootS = s"${Dumps.forSf(sfDir)}/diag_clausesql"
    val fs = new org.apache.hadoop.fs.Path(rootA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(rootA), true)
    fs.delete(new org.apache.hadoop.fs.Path(rootS), true)
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
    timed("init x2")(Seq(rootA, rootS).foreach(r =>
      Snapshots.init(spark, r, e.repartition(4))))
    val src = e.where(col("event_id") % 10 === 0 && col("value").isNotNull)
      .withColumn("value", col("value") * 2)
      .unionByName(e.where(col("event_id") % 10 === 7 && col("value").isNotNull)
        .withColumn("event_id", col("event_id") + 10000000L)
        .withColumn("value", col("value") + 1))
    src.createOrReplaceTempView("diag_merge_src")

    (1 to 2).foreach { round =>
      println(s"[mergediag] ---- round $round (${if (round == 1) "cold" else "warm"})")
      if (round == 2) {
        fs.delete(new org.apache.hadoop.fs.Path(rootA), true)
        fs.delete(new org.apache.hadoop.fs.Path(rootS), true)
        Seq(rootA, rootS).foreach(r => Snapshots.init(spark, r, e.repartition(4)))
      }
      timed("API mergeClauses")(
        Snapshots.mergeClauses(spark, rootA, src, Seq("event_id"),
          matched = Seq(
            Snapshots.MergeWhen.delete(Some("s.value > 150")),
            Snapshots.MergeWhen.update(Map("value" -> "t.value + s.value"))),
          notMatched = Seq(
            Snapshots.MergeWhen.insertAll(Some("s.event_type <> 'click'"))),
          notMatchedBySource = Seq(
            Snapshots.MergeWhen.update(Map("value" -> "0"),
              Some("t.event_id % 100 = 1"))),
          changeFeed = true))
      timed("SQL mergeClauses")(
        SnapshotSql.sql(spark,
          s"""MERGE INTO graft.`$rootS` t USING diag_merge_src s
             |ON t.event_id = s.event_id
             |WHEN MATCHED AND s.value > 150 THEN DELETE
             |WHEN MATCHED THEN UPDATE SET value = t.value + s.value
             |WHEN NOT MATCHED AND s.event_type <> 'click' THEN INSERT *
             |WHEN NOT MATCHED BY SOURCE AND t.event_id % 100 = 1
             |  THEN UPDATE SET value = 0""".stripMargin, changeFeed = true))
      def multisetEqual(a: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame): Boolean =
        a.withColumn("__s", lit(1L)).unionByName(b.withColumn("__s", lit(-1L)))
          .groupBy(a.columns.map(col): _*).agg(sum(col("__s")).as("__d"))
          .where(col("__d") =!= 0L).isEmpty
      timed("proof: head diff")(
        multisetEqual(Snapshots.readVersion(spark, rootA),
          Snapshots.readVersion(spark, rootS)))
      timed("proof: feed diff")(
        multisetEqual(Snapshots.changesBetween(spark, rootA, 0, 1),
          Snapshots.changesBetween(spark, rootS, 0, 1)))
      timed("final aggregate")(
        Snapshots.readVersion(spark, rootS)
          .agg(count(lit(1)), sum(col("event_id")), sum(col("value"))).collect())
    }
    spark.stop()
  }
}
