package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.ext.{DuckSql, ExtSql, SparkSql}

/** Training-data-pipeline queries (dedup, similarity search, text analysis,
  * multimodal metadata) over `documents` / `embeddings`. Each is one
  * dialect-templated pipeline (graft.ext.ExtSql) rendered for Spark and for
  * the DuckDB oracle, so the hash-heavy ops (MinHash, SimHash, sign-LSH)
  * stay bit-identical across engines.
  */
object ExtQueries {

  private def views(s: SparkSession, dir: String): Unit = {
    graft.functions.Shingle3.register(s)
    Tables.documents(s, dir).createOrReplaceTempView("documents")
    Tables.embeddings(s, dir).createOrReplaceTempView("embeddings")
  }

  private def run(build: graft.ext.Sql => String)(s: SparkSession, dir: String): DataFrame = {
    views(s, dir)
    s.sql(build(SparkSql))
  }

  /** Stage caches from the previous staged query: unpersisted lazily at the
    * start of the next one (the caller materializes the returned frame
    * before then). Without this, 15+ staged queries in one session pile up
    * cached blocks until executor memory pressure slows everything. */
  private val liveCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Materialize each stage as a cached temp view, then run the final
    * select. Spark inlines (recomputes) CTEs per reference; caching the
    * stages makes the expensive shingle/signature work run once, which is
    * also the shape a 100 TB run wants (persist the signature table, then
    * self-join it). */
  private def runStaged(st: ExtSql.Staged)(s: SparkSession, dir: String): DataFrame = {
    liveCaches.synchronized {
      liveCaches.foreach(_.unpersist(blocking = false))
      liveCaches.clear()
    }
    views(s, dir)
    st.stages.foreach { case (name, build) =>
      val df = s.sql(build(SparkSql))
      df.cache()
      liveCaches.synchronized { liveCaches += df }
      df.createOrReplaceTempView(name)
    }
    s.sql(st.finalSql(SparkSql))
  }

  private def spec(name: String, build: graft.ext.Sql => String): QuerySpec =
    QuerySpec(name, run(build), Some(build(DuckSql)))

  private def staged(name: String, st: ExtSql.Staged): QuerySpec =
    QuerySpec(name, runStaged(st), Some(st.oracle(DuckSql)))

  val all: Seq[QuerySpec] = Seq(
    spec("dedup_exact", ExtSql.dedupExact),
    staged("dedup_minhash_lsh", ExtSql.dedupMinhashLshStaged),
    staged("dedup_simhash", ExtSql.dedupSimhashStaged),
    staged("dedup_ngram_jaccard", ExtSql.dedupNgramJaccardStaged),
    staged("dedup_embedding_cosine", ExtSql.dedupEmbeddingCosineStaged),
    staged("ann_brute_topk", ExtSql.annBruteTopKStaged(10)),
    staged("ann_lsh_topk", ExtSql.annLshTopKStaged(5)),
    staged("ann_ivf_topk", ExtSql.annIvfTopKStaged(5)),
    staged("text_tfidf_topterms", ExtSql.textTfidfStaged),
    // Native codegen'd Catalyst expression (graft.functions.CosineSimilarity)
    // replacing the interpreted HOF dot products — float->double promotion and
    // sequential summation are identical, so it hash-matches the SAME DuckDB
    // oracle as the HOF ann_brute_topk formulation.
    QuerySpec(
      "ann_native_topk",
      (s, dir) => {
        graft.functions.CosineSimilarity.register(s)
        views(s, dir)
        s.sql(
          """SELECT vec_id, ROUND(cosine_sim(embedding, qe), 4) AS cos
            |FROM embeddings, (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
            |WHERE vec_id <> 0
            |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)
      },
      Some(ExtSql.annBruteTopKStaged(10).oracle(DuckSql))
    ),
    spec("text_langid", ExtSql.textLangId),
    spec("text_quality", ExtSql.textQuality),
    spec("text_tokens", ExtSql.textTokens),
    spec("text_redact", ExtSql.textRedact),
    spec("text_vocab_topk", ExtSql.textVocabTopK(_, 20)),
    staged("text_fingerprint", ExtSql.textFingerprintStaged),
    staged("dedup_minhash_keep", ExtSql.dedupMinhashKeepStaged),
    // Connected components: Spark side = iterative min-label propagation
    // (no recursive SQL in Spark); oracle = DuckDB recursive CTE. Same
    // fixpoint, identical labels.
    QuerySpec(
      "dedup_components",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val pairsStaged = ExtSql.Staged(
          ExtSql.dedupMinhashLshStaged.stages,
          ExtSql.dedupComponents.pairsSql)
        val pairs = runStaged(pairsStaged)(s, dir).cache()
        val edges = pairs.select(col("i").as("a"), col("j").as("b"))
          .union(pairs.select(col("j"), col("i"))).cache()
        var comp = edges.select(col("a").as("id")).distinct()
          .withColumn("comp", col("id"))
        var converged = false
        var iter = 0
        while (!converged && iter < 20) {
          val msgs = edges.join(comp, edges("a") === comp("id"))
            .select(edges("b").as("id"), col("comp"))
          val next = comp.union(msgs).groupBy("id")
            .agg(min("comp").as("comp")).cache()
          converged = next.join(comp.withColumnRenamed("comp", "prev"), Seq("id"))
            .filter(col("comp") =!= col("prev")).isEmpty
          comp.unpersist(blocking = false) // drop the previous iteration's cache
          comp = next
          iter += 1
        }
        comp.select(col("id").as("doc_id"), col("comp")).orderBy(col("doc_id"))
      },
      Some(ExtSql.dedupComponents.oracle(graft.ext.DuckSql))
    ),
    spec("mm_meta", ExtSql.mmMeta)
  )
}
