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
    // The distinct counts are computed as a TWO-STAGE grouped aggregate
    // (groupBy(order, supplier) then groupBy(order)) rather than
    // countDistinct: a multi-distinct aggregate plans through Expand,
    // whose output partitioning is unknown — it would force a re-shuffle
    // even off a bucketed table (see Spine.q21WaitingOrders, which runs
    // this exact shape exchange-free).
    // Scale: lineitem is shuffled exactly twice (once into the per-order
    // aggregate, once as the l1 probe side of the orderkey join — AQE can
    // co-locate the orders join on the same key); supplier⋈nation is a
    // broadcast. No cartesian, no per-row subquery re-scan.
    QuerySpec(
      "q21_waiting_orders",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val perOrder = li
          .groupBy(col("l_orderkey").as("a_orderkey"), col("l_suppkey"))
          .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
          .groupBy(col("a_orderkey"))
          .agg(count(lit(1)).as("n_supp"), sum(col("has_r")).as("n_ret_supp"))
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
    ),

    // ---- Q7 pattern: dual-role dimension (nation joined TWICE — once via
    // supplier, once via customer) with a symmetric pair predicate, revenue
    // by (supp_nation, cust_nation, year). Both nation⋈supplier and
    // nation⋈customer builds are broadcast (each filtered to 2 nations);
    // lineitem⋈orders is the only real shuffle. The pair predicate prunes
    // BEFORE the join via the per-side 2-nation filters, then the exact
    // (A,B)/(B,A) disjunction filters the joined stream.
    QuerySpec(
      "q7_volume_shipping",
      (s, dir) => {
        val pair = Seq("NATION_3", "NATION_8")
        val n1 = Tables.nation(s, dir).where(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, dir).where(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
        val su = broadcast(Tables.supplier(s, dir)
          .join(n1, col("s_nationkey") === col("n1_key"))
          .select(col("s_suppkey"), col("supp_nation")))
        val cu = broadcast(Tables.customer(s, dir)
          .join(n2, col("c_nationkey") === col("n2_key"))
          .select(col("c_custkey"), col("cust_nation")))
        val revenue = dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
        Tables.lineitem(s, dir)
          .join(su, col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(cu, col("o_custkey") === col("c_custkey"))
          .where((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
            (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("bigint").as("l_year"))
          .agg(sum(revenue).cast("double").as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
             |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
             |FROM supplier, lineitem, orders, customer, nation n1, nation n2
             |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
             |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
             |  AND c_nationkey = n2.n_nationkey
             |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
             |    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)
    ),

    // ---- Q15 pattern: aggregate-then-select-the-max (the "top supplier"
    // view + scalar MAX subquery), ties preserved. Decorrelation: the
    // 1-row MAX aggregate joins back EQUI on the decimal revenue value —
    // decimal equality is exact, so ties match bit-for-bit on both
    // engines; no window over a single global partition, no nested loop.
    QuerySpec(
      "q15_top_supplier",
      (s, dir) => {
        val revenue = dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
        val perSupp = Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1996-04-01")))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(revenue).as("total_rev"))
        val maxRev = perSupp.agg(max(col("total_rev")).as("max_rev"))
        perSupp.join(broadcast(maxRev), col("total_rev") === col("max_rev"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("supplier_no") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_rev").cast("double").as("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH revenue AS (
             |  SELECT l_suppkey AS supplier_no,
             |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
             |        (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-04-01'
             |  GROUP BY 1)
             |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
             |FROM supplier JOIN revenue ON s_suppkey = supplier_no
             |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
             |ORDER BY s_suppkey""".stripMargin)
    ),

    // ---- Q22 pattern: scalar-average threshold + anti join ("customers
    // with above-average balance and no recent orders"). The synthetic data
    // gives every customer at least one order, so the NOT EXISTS is
    // date-scoped (no orders since 1999) — same shape, non-empty at every
    // SF. The threshold is a 1-row broadcast (scalar-broadcast allowlist in
    // PlanShapeSpec); the NOT EXISTS decorrelates to a left anti join
    // against the date-filtered, key-projected orders.
    QuerySpec(
      "q22_dormant_customers",
      (s, dir) => {
        val pool = Tables.customer(s, dir)
          .where(col("c_nationkey").isin(0L, 1L, 2L, 3L, 4L, 5L, 6L))
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        val thr = pool.where(col("c_acctbal") > 0)
          .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
            .as("avg_bal"))
        val recent = Tables.orders(s, dir)
          .where(col("o_orderdate") >= to_timestamp(lit("1999-01-01")))
          .select(col("o_custkey"))
        pool.join(broadcast(thr))
          .where(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
          .orderBy(col("c_nationkey"))
      },
      Some("""WITH pool AS (
             |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
             |  WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)),
             |thr AS (
             |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
             |  FROM pool WHERE c_acctbal > 0)
             |SELECT c_nationkey, COUNT(*) AS numcust,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
             |FROM pool, thr
             |WHERE c_acctbal > avg_bal
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // ---- Q2 pattern: correlated per-group MIN membership ("the suppliers
    // achieving the minimum cost for each part"). The supplier-part bridge
    // is derived from lineitem (MIN unit price per part-supplier pair —
    // the synthetic schema has no partsupp table); the correlated scalar
    // MIN decorrelates to a per-part MIN aggregate joined back EQUI on
    // (partkey, cost) — double MIN/equality is exact (no summation), so
    // argmin ties match bit-for-bit. Bridge and per-part aggregate share
    // the l_partkey grouping; part/supplier/nation decodes broadcast.
    QuerySpec(
      "q2_min_cost_supplier",
      (s, dir) => {
        val bridge = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
          .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
        val perPart = bridge.groupBy(col("partkey").as("m_partkey"))
          .agg(min(col("unit_cost")).as("min_cost"))
        val p = broadcast(Tables.part(s, dir).where(col("p_size") < 10)
          .select(col("p_partkey")))
        val sn = broadcast(Tables.supplier(s, dir)
          .join(Tables.nation(s, dir),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name").as("nation")))
        bridge
          .join(perPart, col("partkey") === col("m_partkey") &&
            col("unit_cost") === col("min_cost"))
          .join(p, col("partkey") === col("p_partkey"))
          .join(sn, col("suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("s_name"), col("nation"),
            round(col("unit_cost"), 4).as("unit_cost"))
          .orderBy(col("p_partkey"), col("s_name"))
      },
      Some("""WITH bridge AS (
             |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             |         MIN(l_extendedprice / l_quantity) AS unit_cost
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT p.p_partkey, s.s_name, n.n_name AS nation,
             |  ROUND(b.unit_cost, 4) AS unit_cost
             |FROM part p JOIN bridge b ON b.partkey = p.p_partkey
             |JOIN supplier s ON s.s_suppkey = b.suppkey
             |JOIN nation n ON n.n_nationkey = s.s_nationkey
             |WHERE p.p_size < 10
             |  AND b.unit_cost = (SELECT MIN(b2.unit_cost) FROM bridge b2
             |                     WHERE b2.partkey = p.p_partkey)
             |ORDER BY p.p_partkey, s.s_name""".stripMargin)
    ),

    // ---- Q8 pattern: market share — a conditional-aggregation ratio
    // (one nation's slice of a region+product market, per order year) over
    // a six-table star. Every dimension build broadcasts (region-filtered
    // customer⋈nation, PROMO-filtered part, supplier⋈nation decode);
    // lineitem⋈orders is the only shuffle join. Numerator and denominator
    // are both decimal-exact revenue sums; the ratio divides as double
    // and rounds 6 on both engines.
    QuerySpec(
      "q8_market_share",
      (s, dir) => {
        val revenue = dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
        val custAsia = broadcast(Tables.customer(s, dir)
          .join(Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey")),
            col("c_nationkey") === col("n_nationkey"))
          .join(Tables.region(s, dir).where(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey")))
        val promoPart = broadcast(Tables.part(s, dir)
          .where(col("p_type") === "PROMO").select(col("p_partkey")))
        val suppNation = broadcast(Tables.supplier(s, dir)
          .join(Tables.nation(s, dir)
            .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")),
            col("s_nationkey") === col("sn_key"))
          .select(col("s_suppkey"), col("supp_nation")))
        Tables.lineitem(s, dir)
          .join(promoPart, col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(custAsia, col("o_custkey") === col("c_custkey"))
          .join(suppNation, col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
          .agg(
            (coalesce(sum(when(col("supp_nation") === "NATION_3", revenue)),
              lit(0).cast("decimal(25,4)")).cast("double") /
              sum(revenue).cast("double")).as("share0"))
          .select(col("o_year"), round(col("share0"), 6).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |  ROUND(CAST(COALESCE(SUM(CASE WHEN sn.n_name = 'NATION_3'
             |        THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
             |             (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) END),
             |      CAST(0 AS DECIMAL(25,4))) AS DOUBLE) /
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
             |        (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 6)
             |    AS mkt_share
             |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN nation cn ON cn.n_nationkey = c_nationkey
             |JOIN region ON r_regionkey = cn.n_regionkey
             |JOIN part ON p_partkey = l_partkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation sn ON sn.n_nationkey = s_nationkey
             |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // ---- Q11 pattern: HAVING against a global scalar over the same
    // aggregate ("value concentration": parts whose total value exceeds a
    // multiple of the average part value). The per-part aggregate is
    // computed ONCE and reused for both the groups and the threshold —
    // the 1-row threshold joins back as a scalar broadcast. Threshold is
    // a multiple of the AVERAGE (scale-invariant), not a fixed share of
    // the total (which silently empties as the part count grows).
    // Decimal-exact value sums; the avg threshold divides as double.
    QuerySpec(
      "q11_value_concentration",
      (s, dir) => {
        val pv = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey"))
          .agg(sum(dec(col("l_extendedprice"))).as("val_d"))
        val thr = pv.agg(
          (sum(col("val_d")).cast("double") / count(lit(1)) * lit(1.5))
            .as("threshold"))
        pv.join(broadcast(thr))
          .where(col("val_d").cast("double") > col("threshold"))
          .select(col("l_partkey"), col("val_d").cast("double").as("val"))
          .orderBy(col("val").desc, col("l_partkey"))
      },
      Some("""WITH pv AS (
             |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS val_d
             |  FROM lineitem GROUP BY 1)
             |SELECT l_partkey, CAST(val_d AS DOUBLE) AS val
             |FROM pv
             |WHERE CAST(val_d AS DOUBLE) >
             |  (SELECT CAST(SUM(val_d) AS DOUBLE) / COUNT(*) * 1.5 FROM pv)
             |ORDER BY val DESC, l_partkey""".stripMargin)
    ),

    // ---- Q16 pattern: NOT IN exclusion + grouped COUNT(DISTINCT)
    // ("supplier diversity per product segment, excluding flagged
    // suppliers"). The NOT IN decorrelates to a LEFT ANTI join — exact
    // because supplier keys are non-null (with nullable keys NOT IN has
    // three-valued semantics an anti join does not replicate; the
    // null_semantics_gauntlet pins that difference). The distinct count
    // runs per (brand, size band); the exclusion list is a broadcast.
    QuerySpec(
      "q16_supplier_diversity",
      (s, dir) => {
        val flagged = Tables.supplier(s, dir)
          .where(col("s_acctbal") < 0).select(col("s_suppkey"))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)
            .where(col("p_brand") =!= "Brand#1")
            .select(col("p_partkey"), col("p_brand"), col("p_size"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy(col("p_brand"), (col("p_size") % 5).cast("bigint").as("band"))
          .agg(countDistinct(col("l_suppkey")).as("supp_cnt"))
          .orderBy(col("supp_cnt").desc, col("p_brand"), col("band"))
      },
      Some("""SELECT p_brand, CAST(p_size % 5 AS BIGINT) AS band,
             |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supp_cnt
             |FROM part JOIN lineitem ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#1'
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1, 2 ORDER BY supp_cnt DESC, p_brand, band""".stripMargin)
    ),

    // ---- Q6 pattern: the pure scan-efficiency probe — filter-heavy
    // single-table aggregate with NO join and a 1-row output. The entire
    // query should collapse to scan(+pushed filters) -> partial agg ->
    // final agg; every predicate (date range, discount band, quantity
    // cap) reaches PushedFilters. Revenue = price*discount decimal-exact.
    QuerySpec(
      "q6_revenue_delta",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .agg(
            count(lit(1)).as("n"),
            sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
              .cast("double").as("revenue"))
      },
      Some("""SELECT COUNT(*) AS n,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
             |           CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin)
    ),

    // ---- Q19 pattern: disjunctive join predicate (OR of brand/size/
    // quantity conjunctions). The join key stays a pure equi-join —
    // Catalyst keeps p_partkey = l_partkey as the hash key and evaluates
    // the OR as a post-join filter, while the brand/size arms push into
    // the part scan as (brand=1 OR brand=2 OR brand=3) — a disjunction
    // must never degrade the join itself to nested-loop (the registry
    // no-cartesian spec enforces it).
    QuerySpec(
      "q19_disjunctive_filter",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val p = broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"), col("p_size")))
        val arm1 = col("p_brand") === "Brand#1" &&
          col("p_size").between(1, 15) && col("l_quantity").between(1, 20)
        val arm2 = col("p_brand") === "Brand#2" &&
          col("p_size").between(10, 30) && col("l_quantity").between(10, 30)
        val arm3 = col("p_brand") === "Brand#3" &&
          col("p_size").between(20, 50) && col("l_quantity").between(20, 40)
        li.join(p, col("l_partkey") === col("p_partkey"))
          .where(arm1 || arm2 || arm3)
          .agg(
            count(lit(1)).as("n"),
            sum(dec(col("l_extendedprice")) *
              (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
              .cast("double").as("revenue"))
      },
      Some("""SELECT COUNT(*) AS n,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
             |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
             |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
             |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)""".stripMargin)
    ),

    // ---- Q9 pattern: profit (revenue minus derived cost) by supplier
    // nation and order year, with a part-name LIKE filter. Cost is
    // synthesized from p_retailprice (the schema has no ps_supplycost);
    // all arithmetic stays decimal until the final double cast, so the
    // profit sum is summation-order-proof. supplier⋈nation and the
    // name-filtered part build broadcast; lineitem⋈orders is the shuffle.
    QuerySpec(
      "q9_product_profit",
      (s, dir) => {
        val revD = dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
        val costD = dec(col("l_quantity")) * dec(col("p_retailprice")) *
          lit(0.1).cast("decimal(12,2)")
        val widgetParts = broadcast(Tables.part(s, dir)
          .where(col("p_name").like("%widget%"))
          .select(col("p_partkey"), col("p_retailprice")))
        val suppNation = broadcast(Tables.supplier(s, dir)
          .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("nation")))
        Tables.lineitem(s, dir)
          .join(widgetParts, col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(suppNation, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("nation"), year(col("o_orderdate")).cast("bigint").as("o_year"))
          .agg(sum(revD - costD).cast("double").as("profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
             |        (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) -
             |      CAST(l_quantity AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2)) *
             |        CAST(0.1 AS DECIMAL(12,2))) AS DOUBLE) AS profit
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation ON n_nationkey = s_nationkey
             |WHERE p_name LIKE '%widget%'
             |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)
    ),

    // ---- Q10 pattern: the returned-item report — revenue lost to
    // returns per customer over a quarter, top 20. Star join with the
    // customer decode broadcast; TakeOrderedAndProject caps the sort.
    QuerySpec(
      "q10_returned_items",
      (s, dir) => {
        val revD = dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
        val custNation = broadcast(Tables.customer(s, dir)
          .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("n_name").as("nation")))
        Tables.lineitem(s, dir).where(col("l_returnflag") === "R")
          .join(Tables.orders(s, dir)
            .where(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
              col("o_orderdate") < to_timestamp(lit("1997-07-01"))),
            col("l_orderkey") === col("o_orderkey"))
          .join(custNation, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("nation"))
          .agg(sum(revD).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
             |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN nation ON n_nationkey = c_nationkey
             |WHERE l_returnflag = 'R'
             |  AND o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-07-01'
             |GROUP BY 1, 2, 3, 4
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)
    ),

    // ---- Q12 pattern: two-way conditional counts after a join (high- vs
    // low-priority orders per line status, one ship year). The CASE
    // disjunction aggregates map-side; one shuffle on the tiny group key.
    QuerySpec(
      "q12_priority_by_status",
      (s, dir) => {
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01")))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(high, 1L).otherwise(0L)).cast("bigint").as("high_count"),
            sum(when(high, 0L).otherwise(1L)).cast("bigint").as("low_count"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |      THEN 0 ELSE 1 END) AS BIGINT) AS low_count
             |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // ---- Q14 pattern: promo revenue share over a window — a CASE ratio
    // off ONE part⋈lineitem join (numerator and denominator from the same
    // pass, no second scan). Decimal sums; double division; round 6.
    QuerySpec(
      "q14_promo_share",
      (s, dir) => {
        val revD = dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
        Tables.lineitem(s, dir)
          .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1997-04-01")))
          .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .agg((coalesce(sum(when(col("p_type") === "PROMO", revD)),
              lit(0).cast("decimal(25,4)")).cast("double") * lit(100.0) /
            sum(revD).cast("double")).as("share0"))
          .select(round(col("share0"), 6).as("promo_share"))
      },
      Some("""SELECT ROUND(CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO'
             |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
             |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) END),
             |    CAST(0 AS DECIMAL(25,4))) AS DOUBLE) * 100.0 /
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
             |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 6)
             |  AS promo_share
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin)
    ),

    // ---- Q20 pattern: IN against a HAVING aggregate with a scalar
    // threshold ("suppliers who moved well above the average volume of
    // PROMO parts"). Two nested decorrelations: the scalar average joins
    // as a 1-row broadcast into the HAVING filter, and the qualifying
    // supplier keyset semi-joins supplier. Threshold is a multiple of the
    // per-supplier average (scale-invariant).
    QuerySpec(
      "q20_heavy_suppliers",
      (s, dir) => {
        val perSupp = Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir).where(col("p_type") === "PROMO")
            .select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"))
          .agg(sum(dec(col("l_quantity"))).as("q_d"))
        val thr = perSupp.agg(
          (sum(col("q_d")).cast("double") / count(lit(1)) * lit(1.05)).as("q_thr"))
        val heavy = perSupp.join(broadcast(thr))
          .where(col("q_d").cast("double") > col("q_thr"))
          .select(col("l_suppkey"))
        Tables.supplier(s, dir)
          .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH sq AS (
             |  SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q_d
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE p_type = 'PROMO' GROUP BY 1)
             |SELECT s_suppkey, s_name FROM supplier
             |WHERE s_suppkey IN (
             |  SELECT l_suppkey FROM sq
             |  WHERE CAST(q_d AS DOUBLE) >
             |    (SELECT CAST(SUM(q_d) AS DOUBLE) / COUNT(*) * 1.05 FROM sq))
             |ORDER BY s_suppkey""".stripMargin)
    )
  )
}
