package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketed range join: join points to the intervals containing them.
  *
  * A naive `points JOIN intervals ON p >= lo AND p < hi` has no equi-key, so
  * Spark can only plan it as a BroadcastNestedLoopJoin (small intervals side)
  * or a CartesianProduct (large side) — both all-pairs, both scale killers at
  * 100 TB. The standard fix (public Spark/Databricks range-join optimization,
  * also how interval trees are flattened onto MPP engines) is to overlay a
  * fixed grid of width `binWidth`:
  *
  *   - each point lands in exactly one bin: `floor(p / binWidth)`;
  *   - each interval is exploded to every bin it overlaps
  *     (`sequence(floor(lo/w), floor(hi/w))`);
  *   - the join becomes an EQUI-join on the bin id, post-filtered by the
  *     exact range predicate. Each matching pair is produced exactly once
  *     because the point is in exactly one bin.
  *
  * Scale behavior: the equi-join hashes/broadcasts on the bin key like any
  * other join — AQE, broadcast thresholds, and skew splitting all apply.
  * The only amplification is the interval side, which grows by roughly
  * `avg_interval_width / binWidth + 1` rows; pick `binWidth` near the median
  * interval width so replication stays O(1) per interval. Degenerate
  * intervals (hi < lo) vanish in the explode, mirroring the empty result the
  * range predicate would give.
  */
object RangeJoin {

  /** Join `points` to every row of `intervals` whose half-open range
    * `[loCol, hiCol)` contains `points(pointCol)`. Inner join; all columns of
    * both frames survive. `pointCol`/`loCol`/`hiCol` must be numeric. */
  def binnedPointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bin = "__rj_bin"
    def binOf(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val p = points.withColumn(bin, binOf(col(pointCol)))
    // hi is exclusive, but a point equal to a bin boundary still lives in
    // that bin, so the interval must cover floor(hi/w) too; the exact
    // predicate below removes any overshoot.
    val i = intervals.withColumn(
      bin, explode(sequence(binOf(col(loCol)), binOf(col(hiCol)))))
    p.join(i, Seq(bin), "inner")
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(bin)
  }

  /** Interval-overlap join: all pairs (a, b) whose half-open ranges
    * `[aLo, aHi)` and `[bLo, bHi)` intersect.
    *
    * Both sides explode to their overlapping bins and equi-join on the bin
    * id. A pair of overlapping intervals shares every bin their intersection
    * touches, so to emit each pair EXACTLY once the match is kept only in
    * its canonical bin — the first bin both intervals occupy,
    * `greatest(bin(aLo), bin(bLo))` — rather than deduplicating downstream
    * (a distinct here would be a second shuffle over the pair universe).
    * Replication per side is `width / binWidth + 1`, same dial as the
    * point-in-interval case. */
  def binnedOverlap(
      left: DataFrame,
      aLo: String,
      aHi: String,
      right: DataFrame,
      bLo: String,
      bHi: String,
      binWidth: Double
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bin = "__rj_bin"
    def binOf(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val a = left.withColumn(bin, explode(sequence(binOf(col(aLo)), binOf(col(aHi)))))
    val b = right.withColumn(bin, explode(sequence(binOf(col(bLo)), binOf(col(bHi)))))
    a.join(b, Seq(bin), "inner")
      .where(
        col(bin) === greatest(binOf(col(aLo)), binOf(col(bLo))) &&
          col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .drop(bin)
  }
}
