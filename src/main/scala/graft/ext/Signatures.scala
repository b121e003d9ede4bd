package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, BUCKETED signature tables for the MinHash / SimHash dedup
  * pipelines.
  *
  * At 100 TB the signature build (tokenize -> shingle -> 60-bit hash ->
  * grouped MIN / conditional-SUM aggregates) is the expensive pass, while
  * the band self-join re-runs on every dedup sweep (new batches arrive,
  * thresholds change, keep-lists get recomputed). Persisting the band
  * tables bucketed BY THE JOIN KEY (band, bkey) makes every re-sweep's
  * candidate join plan with ZERO shuffle Exchange: bucket files are
  * co-located, so the join reads both sides in place. The one-off bucketed
  * write costs a single shuffle — amortized across all later sweeps.
  */
object Signatures {

  /** Materialize `staged`'s stages up to and including `upTo` as temp views
    * over `documents` (same stage SQL the oracle-checked queries run). */
  private def stageViews(spark: SparkSession, dir: String, staged: ExtSql.Staged, upTo: String): Unit = {
    graft.functions.Shingle3.register(spark)
    graft.core.Tables.documents(spark, dir).createOrReplaceTempView("documents")
    val idx = staged.stages.indexWhere(_._1 == upTo)
    require(idx >= 0, s"no stage named $upTo")
    staged.stages.take(idx + 1).foreach { case (name, build) =>
      spark.sql(build(SparkSql)).createOrReplaceTempView(name)
    }
  }

  /** Build the MinHash band table from `documents` and persist it bucketed
    * on the band-join key. */
  def writeMinhashBands(spark: SparkSession, dir: String,
      table: String = "mh_bands_bucketed", buckets: Int = 8): Unit = {
    stageViews(spark, dir, ExtSql.dedupMinhashLshStaged, "mh_bands")
    spark.table("mh_bands").write.mode("overwrite")
      .bucketBy(buckets, "band", "bkey").sortBy("band", "bkey")
      .saveAsTable(table)
  }

  /** Build the SimHash band table (doc_id, sim, band, bkey) and persist it
    * bucketed on the band-join key. */
  def writeSimhashBands(spark: SparkSession, dir: String,
      table: String = "sh_bands_bucketed", buckets: Int = 8): Unit = {
    stageViews(spark, dir, ExtSql.dedupSimhashStaged, "sh_bands")
    spark.table("sh_bands").write.mode("overwrite")
      .bucketBy(buckets, "band", "bkey").sortBy("band", "bkey")
      .saveAsTable(table)
  }

  /** Band self-join off a bucketed band table. The join itself plans with
    * no Exchange (co-bucketed sides); only the final candidate-pair
    * distinct shuffles — and that is over candidates, not signatures. */
  def bandSelfJoin(spark: SparkSession, table: String): DataFrame = {
    val ba = spark.table(table).as("ba")
    val bb = spark.table(table).as("bb")
    ba.join(bb,
      col("ba.band") === col("bb.band") &&
      col("ba.bkey") === col("bb.bkey") &&
      col("ba.doc_id") < col("bb.doc_id"))
  }

  /** MinHash candidate pairs from the bucketed band table — one row per
    * (i, j) regardless of how many bands matched. */
  def minhashCandidates(spark: SparkSession, table: String = "mh_bands_bucketed"): DataFrame =
    bandSelfJoin(spark, table)
      .select(col("ba.doc_id").as("i"), col("bb.doc_id").as("j"))
      .distinct()

  /** SimHash candidate pairs (Hamming <= 3 verification applied in-join —
    * the signatures ride along in the band table, so verification needs no
    * extra join). */
  def simhashCandidates(spark: SparkSession, table: String = "sh_bands_bucketed"): DataFrame =
    bandSelfJoin(spark, table)
      .select(col("ba.doc_id").as("i"), col("bb.doc_id").as("j"),
        bit_count(col("ba.sim").bitwiseXOR(col("bb.sim"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
}
