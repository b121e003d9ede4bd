package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations over a frame, evaluated in ONE aggregate pass
  * (every check is a conditional aggregate — no per-check scans, no driver
  * loops; at 100 TB the whole report costs one scan).
  *
  * The reference's quality practice is hard assertions + filters
  * (`/root/reference/src/etl/clean.py:30-49`); this generalizes it to a
  * reporting surface a pipeline can gate on.
  */
object Quality {

  sealed trait Check { def name: String; def agg: Column }
  /** fraction of nulls in a column */
  final case class NotNull(col0: String, maxNullFrac: Double = 0.0) extends Check {
    val name = s"not_null:$col0"
    val agg: Column = (sum(when(col(col0).isNull, 1).otherwise(0)) / count(lit(1))) <= maxNullFrac
  }
  /** all values inside [lo, hi] */
  final case class InRange(col0: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range:$col0"
    val agg: Column = sum(when(col(col0) < lo || col(col0) > hi, 1).otherwise(0)) === 0
  }
  /** column is unique (no duplicate values) */
  final case class Unique(col0: String) extends Check {
    val name = s"unique:$col0"
    val agg: Column = count(col(col0)) === countDistinct(col(col0))
  }
  /** arbitrary row predicate holds for every row */
  final case class Holds(name0: String, pred: Column) extends Check {
    val name = s"holds:$name0"
    val agg: Column = sum(when(pred, 0).otherwise(1)) === 0
  }

  /** One-row report: a boolean column per check plus row count. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: checks.map(c => c.agg.as(c.name))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Gate: throw listing every failed expectation (reference P2 style). */
  def enforce(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val row = report(df, checks).head
    val failed = checks.filterNot(c => row.getAs[Boolean](c.name))
    require(failed.isEmpty, s"quality checks failed: ${failed.map(_.name).mkString(", ")}")
    df
  }
}
