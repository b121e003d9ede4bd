package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers for hot keys at scale.
  *
  * AQE's skew-join splitting (on in graft.core.Sessions) handles most join
  * skew at runtime; these helpers cover the aggregation-skew case AQE does
  * not re-plan: a groupBy where one key holds a large fraction of all rows
  * lands that key's entire partial state on one reducer. Salting splits the
  * hot key across `saltBuckets` reducers with a two-stage aggregate; the
  * algebra below is exact for the decomposable aggregates the engine uses
  * (count / sum / min / max, and avg via sum+count).
  */
object Skew {

  /** Add a deterministic salt column derived from a spread column (stable
    * across retries, unlike rand()). */
  def withSalt(df: DataFrame, spreadCol: String, saltBuckets: Int, saltCol: String = "__salt"): DataFrame =
    df.withColumn(saltCol, pmod(xxhash64(col(spreadCol)), lit(saltBuckets)))

  /** Two-stage salted count+sum aggregate: stage 1 groups by (key, salt)
    * — spreading a hot key over `saltBuckets` reducers — stage 2 merges the
    * partials per key. Exact for count/sum/avg. */
  def saltedAgg(
      df: DataFrame,
      key: String,
      valueCol: String,
      spreadCol: String,
      saltBuckets: Int = 16
  ): DataFrame = {
    val salted = withSalt(df, spreadCol, saltBuckets)
    val partial = salted
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial
      .groupBy(col(key))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).as("total"),
        (sum(col("__s")) / sum(col("__n"))).as("avg")
      )
  }

  /** Broadcast-salted join for a skewed LEFT side against a small-ish right
    * side: explode the right frame across all salt values so the join key
    * becomes (key, salt) — the hot key's rows spread over `saltBuckets`
    * tasks. Right side grows by `saltBuckets`x, so this suits dimension-
    * scale right sides that just miss the broadcast threshold. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      spreadCol: String,
      saltBuckets: Int = 16,
      joinType: String = "inner"
  ): DataFrame = {
    val saltedLeft = withSalt(left, spreadCol, saltBuckets)
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1L))))
    saltedLeft.join(explodedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Rough skew probe: top-k key frequencies as a fraction of total — used
    * to decide whether salting is worth the extra shuffle stage. */
  def keySkew(df: DataFrame, key: String, k: Int = 5): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"))
      .limit(k)
      .withColumn("fraction", col("n") / total)
  }
}
