package graft.ext

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real IVF (inverted-file) ANN with a TRAINED coarse quantizer.
  *
  * The SQL-templated `ann_ivf_*` queries use the pre-assigned `label`
  * column as the cluster id so the whole pipeline stays oracle-checkable;
  * this module is the production path: fit a Spark ML KMeans quantizer,
  * assign every vector to its nearest centroid, and at query time scan
  * only the `nprobe` clusters whose centroids are closest to the query.
  *
  * Scale shape: the index build is one KMeans fit (sampled at 100 TB) plus
  * one embarrassingly parallel assignment pass; the per-query probe choice
  * runs driver-side over k centroids (tiny), and the scan is a
  * cluster-pruned filter + the native fused `cosine_sim` + top-k
  * (TakeOrderedAndProject) — never a full-corpus ranking. Persist the index
  * partitioned BY cluster and the probe filter becomes partition pruning.
  */
object Ann {

  /** Fit the coarse quantizer and build the index: embeddings + `cluster`. */
  def ivfFit(spark: SparkSession, emb: DataFrame, k: Int, seed: Long = 42L): (KMeansModel, DataFrame) = {
    val withVec = emb.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features").fit(withVec)
    val index = model.transform(withVec)
      .withColumnRenamed("prediction", "cluster")
      .drop("features")
    (model, index)
  }

  /** Persist the index partitioned BY cluster: at read time the nprobe
    * filter becomes partition pruning, so a probe touches only its
    * clusters' files — the scan cost is O(corpus/k * nprobe), never the
    * corpus, and on object storage the untouched partitions are never even
    * listed into the scan. */
  def writeIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** Reload a persisted index; `cluster` comes back as a partition column. */
  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Top-k cosine search probing the `nprobe` nearest clusters. */
  def ivfSearch(spark: SparkSession, index: DataFrame, model: KMeansModel,
                query: Array[Float], nprobe: Int, topK: Int): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val q = query.map(_.toDouble)
    def l2(c: org.apache.spark.ml.linalg.Vector): Double = {
      var s = 0.0; var i = 0
      while (i < q.length) { val d = c(i) - q(i); s += d * d; i += 1 }
      s
    }
    val probes = model.clusterCenters.zipWithIndex
      .sortBy { case (c, i) => (l2(c), i) }
      .take(math.max(1, nprobe)).map(_._2).toSeq
    val qLit = s"CAST(array(${query.map(f => s"CAST($f AS FLOAT)").mkString(", ")}) AS ARRAY<FLOAT>)"
    index.filter(col("cluster").isin(probes: _*))
      .withColumn("cos", expr(s"cosine_sim(embedding, $qLit)"))
      .orderBy(desc("cos"), col("vec_id"))
      .limit(topK)
      .select("vec_id", "cluster", "cos")
  }
}
