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
