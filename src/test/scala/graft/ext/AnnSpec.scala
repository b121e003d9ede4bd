package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Real KMeans-quantized IVF: exhaustive probing must equal brute force
  * exactly; single-probe must still find the query's own vector (its
  * assigned cluster IS the nearest centroid by construction). */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb = Tables.embeddings(spark, TestSpark.sfDir)
  private lazy val (model, index) = Ann.ivfFit(spark, emb, k = 8)
  private lazy val query: Array[Float] = emb.filter(col("vec_id") === 0)
    .select("embedding").head.getSeq[Float](0).toArray

  test("nprobe = k (exhaustive) reproduces brute-force top-k exactly") {
    graft.functions.CosineSimilarity.register(spark)
    val ivf = Ann.ivfSearch(spark, index, model, query, nprobe = 8, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val qLit = s"CAST(array(${query.map(f => s"CAST($f AS FLOAT)").mkString(", ")}) AS ARRAY<FLOAT>)"
    val brute = emb.withColumn("cos", expr(s"cosine_sim(embedding, $qLit)"))
      .orderBy(desc("cos"), col("vec_id")).limit(10)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    assert(ivf.sameElements(brute))
  }

  test("persisted index: probe filter prunes partitions and top-k is identical") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    Ann.writeIndex(index, dir)
    val reloaded = Ann.readIndex(spark, dir)
    val search = Ann.ivfSearch(spark, reloaded, model, query, nprobe = 3, topK = 10)
    val p = search.queryExecution.executedPlan.toString
    // the cluster probe must surface as PARTITION pruning on the scan, not
    // a post-scan data filter
    assert(p.contains("PartitionFilters: [cluster"), p.take(1200))
    val fromDisk = search.collect().map(r => (r.getLong(0), r.getDouble(2)))
    val fromMem = Ann.ivfSearch(spark, index, model, query, nprobe = 3, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(fromDisk.sameElements(fromMem))
  }

  test("feed-driven refresh of a snapshot-logged KMeans index == full rebuild, same top-k") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("ivf_inc").toString
    val (srcRoot, idxRoot) = (s"$base/src", s"$base/idx")
    graft.jobs.Snapshots.init(spark, srcRoot, emb)
    // real quantizer: the KMeans model fit on v0 stays FIXED across
    // refreshes (incremental maintenance re-assigns, never re-fits)
    def assign(df: org.apache.spark.sql.DataFrame) =
      Ann.ivfAssign(model, df)
    graft.jobs.Snapshots.commitStreamingBatch(spark, idxRoot, assign(emb), 0L)
    // the store evolves: some vectors re-embedded, some new, some deleted
    val updates = emb.where(col("vec_id") % 5 === 2)
      .withColumn("embedding", expr("transform(embedding, x -> -x)"))
    val inserts = emb.where(col("vec_id") % 9 === 4)
      .withColumn("vec_id", col("vec_id") + 5000000L)
    graft.jobs.Snapshots.mergeCow(spark, srcRoot,
      updates.unionByName(inserts), Seq("vec_id"), changeFeed = true)
    graft.jobs.Snapshots.deleteKeysCow(spark, srcRoot,
      emb.where(col("vec_id") % 13 === 6).select("vec_id"),
      Seq("vec_id"), changeFeed = true)
    val indexedTo = Ann.refreshIvfIndex(spark, srcRoot, idxRoot)(assign)
    assert(indexedTo == 2L)
    assert(graft.jobs.Snapshots.lastCommittedBatch(spark, idxRoot) == 2L,
      "the index log must record the source version it reflects")
    // refreshed content == rebuilt content (same fixed quantizer)
    val rebuilt = assign(graft.jobs.Snapshots.readVersion(spark, srcRoot))
    val refreshed = graft.jobs.Snapshots.readVersion(spark, idxRoot)
      .select(rebuilt.columns.map(col): _*)
    assert(refreshed.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(refreshed).isEmpty,
      "feed-driven refresh must equal a full rebuild")
    // and the search surface agrees end to end
    val a = Ann.ivfSearch(spark, refreshed, model, query, nprobe = 3, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val b = Ann.ivfSearch(spark, rebuilt, model, query, nprobe = 3, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(a == b, "refreshed-index top-k must equal rebuilt-index top-k")
    // a second refresh with nothing new is a no-op at the same version
    assert(Ann.refreshIvfIndex(spark, srcRoot, idxRoot)(assign) == 2L)
  }

  test("nprobe = 1 scans one cluster and still finds the query vector first") {
    val top = Ann.ivfSearch(spark, index, model, query, nprobe = 1, topK = 5).collect()
    assert(top.nonEmpty && top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(2) - 1.0) < 1e-9)
    // all hits come from the probed (single) cluster
    assert(top.map(_.getInt(1)).distinct.length == 1)
    // and the scan was cluster-pruned: fewer candidates than the corpus
    val clusterSize = index.filter(col("cluster") === top.head.getInt(1)).count()
    assert(clusterSize < emb.count())
  }
}
