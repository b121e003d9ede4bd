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

  /** Assign a batch of (vec_id, embedding, …) rows to a FIXED quantizer's
    * nearest centroids — the unit of incremental index maintenance
    * (`refreshIvfIndex` re-fits nothing; re-fitting is a rebuild). */
  def ivfAssign(model: KMeansModel, batch: DataFrame): DataFrame = {
    val withVec = batch.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    model.transform(withVec)
      .withColumnRenamed("prediction", "cluster")
      .drop("features")
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

  /** Incrementally maintain a SNAPSHOT-LOGGED ANN index against its
    * snapshot-logged source table (jobs/Snapshots): replay the source's
    * change feeds version by version since the last indexed source
    * version, re-assign ONLY the changed vectors (`assign` maps a batch
    * of source rows to index rows — typically a fixed-quantizer cluster
    * assignment), and commit each index update tagged `#txn:<srcVersion>`
    * so `lastCommittedBatch` on the INDEX log reads back the source
    * version the index reflects. Crash/replay safe for the same reason
    * streaming ingest is: a re-run sees `from >= srcV` (or replays
    * version deltas whose merges are idempotent keyed upserts).
    *
    * Initialize by committing the full assignment with
    * `Snapshots.commitStreamingBatch(spark, idxRoot, assign(fullTable),
    * batchId = srcVersion)`.
    *
    * Scale shape: refresh work is O(changed vectors), never O(corpus) —
    * the feed is the 1000×-smaller stream a 100 TB embedding store
    * maintains its index from; a full rebuild is the disaster-recovery
    * path, not the steady state. */
  def refreshIvfIndex(
      spark: SparkSession, srcRoot: String, idxRoot: String,
      keyCols: Seq[String] = Seq("vec_id"))(assign: DataFrame => DataFrame): Long = {
    import graft.jobs.{ChangeFeed, Snapshots}
    val srcV = Snapshots.latestVersion(spark, srcRoot)
    val from = Snapshots.lastCommittedBatch(spark, idxRoot)
    require(from >= 0L, s"index at $idxRoot has no recorded source version — " +
      "initialize via commitStreamingBatch(idxRoot, assign(full), srcVersion)")
    if (from >= srcV) return from
    // exact replay order: a key updated in v then deleted in v+1 must end
    // deleted — so apply each source version's feed in sequence, upserts
    // before that version's deletes (ChangeFeed semantics within one
    // commit: a key appears as either upsert or delete, never both)
    ((from + 1) to srcV).foreach { v =>
      // O(change) feed, read once: the isEmpty probes and the commits
      // below would each re-scan it otherwise
      val feed = Snapshots.changesBetween(spark, srcRoot, v - 1, v).localCheckpoint()
      val ups = feed.where(col(ChangeFeed.opCol)
        .isin("insert", "update_postimage")).drop(ChangeFeed.opCol)
      val dels = feed.where(col(ChangeFeed.opCol) === "delete")
        .select(keyCols.map(col): _*)
      if (!ups.isEmpty)
        Snapshots.mergeCow(spark, idxRoot, assign(ups), keyCols, txn = Some(v))
      if (!dels.isEmpty)
        Snapshots.deleteKeysCow(spark, idxRoot, dels, keyCols, txn = Some(v))
    }
    srcV
  }

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
