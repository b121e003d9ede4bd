package graft.ext

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Product-quantization invariants that hold regardless of data geometry
  * (recall@k is data-dependent — near-uniform synthetic vectors bound it —
  * but Lloyd's iteration MUST monotonically reduce quantization
  * distortion, and the encoding must be total and in-domain). */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val st = ExtSql.annPqTopKStaged(10)

  private def withStages(finalSql: String): DataFrame = {
    Tables.embeddings(spark, TestSpark.sfDir).createOrReplaceTempView("embeddings")
    val ctes = st.stages.map { case (n, b) => s"$n AS (${b(SparkSql)})" }.mkString(",\n")
    spark.sql(s"WITH $ctes\n$finalSql")
  }

  /** Total distortion of assignment view `asg` against centroid view
    * `cents` (sum over every (vec, sub) of squared L2 to its centroid). */
  private def distortion(asg: String, cents: String): Double =
    withStages(
      s"""SELECT SUM(d2) AS d FROM (
         |  SELECT a.vec_id, a.sub, SUM((e.v - c.c) * (e.v - c.c)) AS d2
         |  FROM $asg a
         |  JOIN pq_e e ON a.vec_id = e.vec_id AND a.sub = e.sub
         |  JOIN $cents c ON a.sub = c.sub AND a.code = c.code AND e.dim = c.dim
         |  GROUP BY a.vec_id, a.sub)""".stripMargin)
      .collect()(0).getDouble(0)

  test("Lloyd's iteration monotonically reduces quantization distortion") {
    val d_a1c0 = distortion("pq_a1", "pq_c0") // init assignment vs init centroids
    val d_a1c1 = distortion("pq_a1", "pq_c1") // update step: same assignment, new centroids
    val d_a2c1 = distortion("pq_a2", "pq_c1") // assignment step: same centroids, new assignment
    val d_a2c2 = distortion("pq_a2", "pq_c2")
    val d_fc2 = distortion("pq_code", "pq_c2")
    val eps = 1e-6
    assert(d_a1c1 <= d_a1c0 + eps, s"centroid update increased distortion: $d_a1c0 -> $d_a1c1")
    assert(d_a2c1 <= d_a1c1 + eps, s"reassignment increased distortion: $d_a1c1 -> $d_a2c1")
    assert(d_a2c2 <= d_a2c1 + eps, s"centroid update increased distortion: $d_a2c1 -> $d_a2c2")
    assert(d_fc2 <= d_a2c2 + eps, s"final encode increased distortion: $d_a2c2 -> $d_fc2")
  }

  test("encoding is total and in-domain: every vector gets 8 codes in [0,8)") {
    val row = withStages(
      """SELECT COUNT(*) AS n_codes,
        |  COUNT(DISTINCT vec_id) AS n_vecs,
        |  MIN(code) AS lo, MAX(code) AS hi
        |FROM pq_code""".stripMargin).collect()(0)
    val nVecs = Tables.embeddings(spark, TestSpark.sfDir).count()
    assert(row.getLong(1) == nVecs)
    assert(row.getLong(0) == nVecs * 8, "each vector must encode to exactly 8 sub-codes")
    assert(row.getLong(2) >= 0 && row.getLong(3) < 8)
  }
}
