package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a named Spark query over the synthetic
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Determinism contract for the driver's hash compare (see builder prompt):
  *   - every query ends in a total ORDER BY;
  *   - aggregate/computed columns are aliased identically on both sides;
  *   - money/quantity sums go through exact DECIMAL arithmetic then cast to
  *     double (bit-identical across engines regardless of summation order);
  *   - double averages/stddevs/percentiles are rounded (4-6 decimals) on both
  *     sides so sub-ulp summation-order differences cannot flip the hash;
  *   - integer-typed derivations are cast to BIGINT on both sides.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
