package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass distributed moments via a typed `Aggregator` — the
  * `TypedColumn` custom-aggregate tier (SURVEY §2 custom-operator
  * preference (b)): per-partition Welford updates merged with the
  * Chan/Golub/LeVeque pairwise formula, so the result is numerically
  * stable at any partition count — the shape a 100 TB single-pass
  * mean/variance wants (each task keeps O(1) state; merges are
  * associative, so AQE/speculative re-merges are safe).
  *
  * This demonstrates the typed-aggregation surface; for plain columns the
  * built-in `avg`/`var_pop` remain preferable (codegen'd partial
  * aggregates). Use an Aggregator when the accumulator is richer than the
  * built-ins offer (e.g. joint moments, reservoir state).
  */
object OnlineStats {

  /** (count, mean, M2 = sum of squared deviations from the running mean) */
  final case class Moments(n: Long, mean: Double, m2: Double) {
    def variance: Double = if (n == 0) Double.NaN else m2 / n
    def sampleVariance: Double = if (n < 2) Double.NaN else m2 / (n - 1)
  }

  private def update(b: Moments, x: Double): Moments = {
    val n = b.n + 1
    val d = x - b.mean
    val mean = b.mean + d / n
    Moments(n, mean, b.m2 + d * (x - mean))
  }

  private def combine(a: Moments, b: Moments): Moments =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      Moments(
        n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n.toDouble * b.n / n)
    }

  /** Moments aggregator over any input type via a projection — usable with
    * `Dataset.select` and `KeyValueGroupedDataset.agg` alike. */
  def momentsOf[I](f: I => Double): Aggregator[I, Moments, Moments] =
    new Aggregator[I, Moments, Moments] {
      override def zero: Moments = Moments(0L, 0.0, 0.0)
      override def reduce(b: Moments, x: I): Moments = update(b, f(x))
      override def merge(a: Moments, b: Moments): Moments = combine(a, b)
      override def finish(r: Moments): Moments = r
      override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
      override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
    }

  val varianceAgg: Aggregator[Double, Moments, Moments] = momentsOf[Double](identity)

  /** Typed column for `ds.select(onlineMoments)`. */
  def onlineMoments: TypedColumn[Double, Moments] = varianceAgg.toColumn
}
