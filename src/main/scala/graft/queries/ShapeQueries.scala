package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Subquery-decorrelation query shapes (TPC-H Q4/Q13/Q17/Q18 patterns).
  *
  * The oracle side runs the classic subquery SQL (EXISTS, correlated scalar
  * aggregate, IN-over-HAVING); the Spark side is the hand-decorrelated plan a
  * cost-based engine produces — semi joins and pre-aggregated join builds —
  * so the parity gate proves the decorrelation is exact, not just plausible.
  *
  * Determinism follows the QuerySpec contract; every threshold comparison
  * that feeds a filter is DECIMAL-exact on both sides (a double avg at a
  * boundary could flip membership per engine — the q17 trap: instead of
  * `qty < 0.2 * avg(qty)` we compare `5 * qty * cnt < sum(qty)` in exact
  * decimal arithmetic, algebraically identical for cnt > 0).
  */
object ShapeQueries {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  def all: Seq[QuerySpec] = Seq(

    // ---- Q4 pattern: EXISTS decorrelated to a LEFT SEMI join. The probe
    // side is pre-filtered + pruned to the join key before the shuffle, so
    // at scale the semi join moves only (l_orderkey) pairs, not lineitem.
    QuerySpec(
      "q4_order_priority",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1996-07-01")))
        val li = Tables.lineitem(s, dir)
          .where(col("l_quantity") > 48).select(col("l_orderkey"))
        o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-07-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity > 48)
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // ---- Q13 pattern: outer join preserving empty groups (COUNT(col)
    // skips the null-extended rows), then a second aggregation over the
    // first's result — the two-level "distribution of counts" shape.
    QuerySpec(
      "q13_customer_distribution",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .where(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey"))
        val per = Tables.customer(s, dir).select(col("c_custkey"))
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
        per.groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
             |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY 1) t
             |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin)
    ),

    // ---- Q17 pattern: correlated scalar aggregate (per-part avg quantity)
    // decorrelated to a pre-aggregated join build. The oracle keeps the
    // correlated form so DuckDB's own decorrelation is the cross-check.
    // Exact-decimal threshold (see class doc); sum/7.0 is a deterministic
    // double function of an exact decimal input.
    QuerySpec(
      "q17_small_quantity_revenue",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val p = Tables.part(s, dir)
          .where(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
          .select(col("p_partkey"))
        val agg = li.groupBy(col("l_partkey").as("a_partkey"))
          .agg(sum(dec(col("l_quantity"))).as("sum_q"), count(lit(1)).as("cnt_q"))
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(agg, col("l_partkey") === col("a_partkey"))
          .where(dec(col("l_quantity")) * lit(5) * col("cnt_q") < col("sum_q"))
          .agg((dsum(col("l_extendedprice")) / lit(7.0)).cast("double").as("avg_yearly"))
      },
      Some("""SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE p_brand IN ('Brand#1','Brand#2','Brand#3')
             |  AND CAST(l_quantity AS DECIMAL(12,2)) * 5 *
             |      (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
             |    < (SELECT SUM(CAST(l_quantity AS DECIMAL(12,2))) FROM lineitem l2
             |       WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin)
    ),

    // ---- Q18 pattern: IN over a HAVING aggregate, decorrelated to a semi
    // join against the pre-aggregated key list; big-quantity orders then
    // re-joined to their customers, top-k by order value.
    QuerySpec(
      "q18_large_orders",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val big = li.groupBy(col("l_orderkey"))
          .agg(sum(dec(col("l_quantity"))).as("tq"))
          .where(col("tq") > lit(320))
          .select(col("l_orderkey").as("big_orderkey"))
        li.join(big, col("l_orderkey") === col("big_orderkey"), "left_semi")
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
          .agg(dsum(col("l_quantity")).as("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, o_totalprice,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_orderkey IN (
             |  SELECT l_orderkey FROM lineitem GROUP BY 1
             |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 320)
             |GROUP BY 1, 2, 3, 4
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)
    ),

    // ---- Q21 pattern: double-correlated EXISTS + NOT EXISTS over the same
    // table (suppliers who were the sole fault in a multi-supplier order).
    // The synthetic lineitem has no receipt/commit dates, so the "fault"
    // predicate is l_returnflag = 'R' — the shape (two correlated
    // subqueries on lineitem, one positive one negative, both keyed by
    // l_orderkey with a <> l_suppkey guard) is exactly TPC-H Q21
    // (reference scope: beyond — warehouse stretch tier, VERDICT r4 #3).
    //
    // Hand-decorrelation: ONE per-order aggregate replaces BOTH subqueries —
    //   n_supp     = COUNT(DISTINCT l_suppkey)            ⇒ EXISTS(other
    //                supplier) ≡ n_supp >= 2
    //   n_ret_supp = COUNT(DISTINCT l_suppkey) FILTER ('R') ⇒ NOT EXISTS
    //                (other 'R' supplier) ≡ n_ret_supp = 1, because l1
    //                itself is 'R' so its supplier is always in the set.
    // Scale: lineitem is shuffled exactly twice (once into the per-order
    // aggregate, once as the l1 probe side of the orderkey join — AQE can
    // co-locate the orders join on the same key); supplier⋈nation is a
    // broadcast. No cartesian, no per-row subquery re-scan.
    QuerySpec(
      "q21_waiting_orders",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val perOrder = li.groupBy(col("l_orderkey").as("a_orderkey"))
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
              .as("n_ret_supp"))
        val l1 = li.where(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_suppkey"))
        val faulted = l1
          .join(perOrder, col("l_orderkey") === col("a_orderkey"))
          .where(col("n_supp") >= 2 && col("n_ret_supp") === 1)
          .join(Tables.orders(s, dir).where(col("o_orderstatus") === "F")
            .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
        val supp = broadcast(
          Tables.supplier(s, dir)
            .join(Tables.nation(s, dir).where(col("n_name") === "NATION_3"),
              col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey"), col("s_name")))
        faulted.join(supp, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""SELECT s_name, COUNT(*) AS numwait
             |FROM supplier, lineitem l1, orders, nation
             |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
             |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_returnflag = 'R')
             |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
             |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)
    )
  )
}
