package graft.queries

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic TPC-H query shapes adapted to the fixture schema (SURVEY.md
  * §2 C/D/F; the fixtures lack partsupp/l_shipmode/l_commitdate, so
  * Q2/Q8/Q9/Q11/Q12/Q16/Q21 have no faithful adaptation — the shapes
  * below cover the remaining access patterns: selective fact filters,
  * multi-way star joins with a cross-dimension equality (Q5's
  * c_nationkey = s_nationkey), semi-join EXISTS rewrites, group-HAVING
  * re-joins, conditional-aggregate ratios, and OR-of-AND predicate
  * pushdown).
  *
  * Scale notes (100 TB): every query here is a declarative plan —
  * filters sit directly on the scans (PushedFilters), dims are
  * broadcast, fact-fact joins are sort-merge on their natural keys,
  * and the top-k finals are TakeOrderedAndProject (no global sort).
  * Money sums follow the decimal-cast discipline (exact,
  * order-independent) so results are reproducible under any partition
  * count or merge order.
  */
object TpcH {

  private val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
    .cast("decimal(22,4)")
  private val revSql =
    "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS DOUBLE)"
  /** ≡ the decimal revenue sum cast to double, but in primitive codegen — see
    * [[graft.functions.ExactSum]]; every consumer stays gated by the
    * unchanged decimal-sum oracle SQL above.
    */
  private val revSum =
    graft.functions.ExactSum.moneySum("l_extendedprice * (1 - l_discount)", 10000L)

  /** Q3 shipping priority: unshipped high-value orders for one market
    * segment. Two fact scans with pushed date filters; the customer
    * dim joins broadcast-or-AQE; final is top-10 by revenue.
    */
  val q3 = DeclaredQuery(
    "q_tpch_q3",
    s"""SELECT l_orderkey, $revSql AS revenue, o_orderdate
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-03-15'
       |  AND l_shipdate > TIMESTAMP '1998-03-15'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin) { (s, d) =>
    val cutoff = lit("1998-03-15").cast("timestamp")
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d).filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(revSum.as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q4 order-priority checking: EXISTS rewritten as a left-semi join
    * (the same decorrelation Catalyst performs on the subquery form),
    * then a small groupBy over the 5 priorities.
    */
  val q4 = DeclaredQuery(
    "q_tpch_q4",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
    val l = Tables.lineitem(s, d)
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Q5 local-supplier volume: the 6-way star with the cross-dimension
    * constraint c_nationkey = s_nationkey (customer and supplier in
    * the same nation). nation/region broadcast; the supplier match is
    * an equi-join on (l_suppkey, c_nationkey) so no theta join
    * appears anywhere in the plan.
    */
  val q5 = DeclaredQuery(
    "q_tpch_q5",
    s"""SELECT n_name, $revSql AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'EUROPE'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .groupBy("n_name")
      .agg(revSum.as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q6 forecasting revenue: pure scan-filter-aggregate — every
    * predicate pushes to the parquet scan, the agg is a single
    * partial+final over zero shuffled rows. The canonical "is the
    * storage layer doing the work" probe.
    */
  val q6 = DeclaredQuery(
    "q_tpch_q6",
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(22,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(graft.functions.ExactSum
          .moneySum("l_extendedprice * l_discount", 10000L).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** Q10 returned-item reporting: customers who returned goods, by lost
    * revenue. Fact-fact sort-merge join; customer/nation broadcast;
    * top-20 final.
    */
  val q10 = DeclaredQuery(
    "q_tpch_q10",
    s"""SELECT c_custkey, c_name, $revSql AS revenue, n_name
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-07-01'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-07-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(revSum.as("revenue"))
      .select("c_custkey", "c_name", "revenue", "n_name")
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q14 promotion effect: conditional-aggregate ratio (promo revenue /
    * total revenue). Both sums share one scan+agg; the ratio divides
    * the exact decimals in double space identically in both engines.
    */
  val q14 = DeclaredQuery(
    "q_tpch_q14",
    """SELECT
      |  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))
      |      ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS DOUBLE)
      |    AS promo_revenue_pct
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        graft.functions.ExactSum.moneySum(
          "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END",
          10000L) /
        revSum).as("promo_revenue_pct"))
  }

  /** Q18 large-volume customers. The textbook form re-joins the full
    * fact after the HAVING subquery, but the outer GROUP BY keys
    * (c_custkey, o_orderkey, o_orderdate, o_totalprice) are
    * functionally determined by o_orderkey — the outer sum IS the
    * per-order sum the HAVING already computed. So aggregate lineitem
    * ONCE, filter, and join only the tiny qualifying set to
    * orders/customer (AQE broadcasts it). Measured: the two-scan
    * two-agg form spent 53% of its 1.43 s in the second fact pass
    * (JobProf); this form scans and aggregates the fact once.
    */
  val q18 = DeclaredQuery(
    "q_tpch_q18",
    """SELECT c_custkey, o_orderkey, o_orderdate,
      |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
      |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d).groupBy("l_orderkey")
      .agg(graft.functions.ExactSum.moneySum("l_quantity", 100L).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    big
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice").cast("double").as("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Q19-ish disjunctive predicate: OR of (brand, size-range,
    * quantity-range) conjunctions across the join. Catalyst extracts
    * the common l_partkey = p_partkey equi-condition and pushes the
    * per-side residuals into the scans.
    */
  val q19 = DeclaredQuery(
    "q_tpch_q19",
    """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1 AND l_quantity <= 21)
      |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
      |       AND l_quantity >= 10 AND l_quantity <= 40)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
      |       AND l_quantity >= 20 AND l_quantity <= 50)""".stripMargin) { (s, d) =>
    val c1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
      col("l_quantity") >= 1 && col("l_quantity") <= 21
    val c2 = col("p_brand") === "Brand#13" && col("p_size").between(10, 30) &&
      col("l_quantity") >= 10 && col("l_quantity") <= 40
    val c3 = col("p_brand") === "Brand#23" && col("p_size").between(20, 50) &&
      col("l_quantity") >= 20 && col("l_quantity") <= 50
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
      .filter(c1 || c2 || c3)
      .agg(revSum.as("revenue"), count(lit(1)).as("n"))
  }

  /** Q7 volume shipping: revenue between a nation PAIR in both
    * directions, by ship year — two independent joins to the same
    * nation dim (supplier's and customer's), a symmetric OR-pair
    * predicate, and a derived grouping column.
    */
  val q7 = DeclaredQuery(
    "q_tpch_q7",
    s"""SELECT supp_nation, cust_nation, l_year, $revSql AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
       |         l_extendedprice, l_discount
       |  FROM lineitem
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
       |      OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
       |    AND l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1998-01-01') t
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
    val n1 = broadcast(Tables.nation(s, d))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = broadcast(Tables.nation(s, d))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_20" && col("cust_nation") === "NATION_11") ||
        (col("supp_nation") === "NATION_11" && col("cust_nation") === "NATION_20"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(revSum.as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q13 customer distribution: LEFT join so zero-order customers
    * count, then a histogram over the per-customer counts — the
    * double-aggregation shape (agg of an agg).
    */
  val q13 = DeclaredQuery(
    "q_tpch_q13",
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q22-ish global-sales opportunity: above-average-balance customers
    * with no urgent orders — an uncorrelated scalar subquery feeding a
    * filter plus a NOT EXISTS anti join (fixture customers all have
    * SOME order, so the classic no-orders form would be empty; the
    * priority filter keeps the same plan shape with live rows).
    */
  val q22 = DeclaredQuery(
    "q_tpch_q22",
    """SELECT CAST(c_custkey % 10 AS BIGINT) AS cntrycode,
      |  CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    // uncorrelated scalar subquery as a broadcast single-row join —
    // stays lazy/distributed (no driver-side first()), same plan
    // Catalyst builds for the SQL scalar-subquery form
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_custkey") % 10).cast("long").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
      .orderBy("cntrycode")
  }

  /** Q15 top supplier: a reused revenue CTE + an uncorrelated MAX
    * scalar subquery over it, expressed as a broadcast single-row
    * join (ties all surface — the ORDER BY makes them deterministic).
    */
  val q15 = DeclaredQuery(
    "q_tpch_q15",
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val revenue = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(revSum.as("total_revenue"))
    // global-window max instead of a second aggregate subplan: the
    // post-agg relation is |suppliers| rows, so the single-partition
    // window is trivial, and the filtered lineitem scan+shuffle runs
    // ONCE (a separate maxRev subquery would re-run the whole fact
    // aggregation — Spark does not dedup uncached subtrees).
    val withMax = revenue.withColumn("max_revenue",
      max(col("total_revenue")).over(Window.partitionBy()))
    Tables.supplier(s, d)
      .join(withMax, col("s_suppkey") === col("supplier_no"))
      .filter(col("total_revenue") === col("max_revenue"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** Q17 small-quantity-order revenue: the correlated per-part
    * average (l_quantity < 0.2 * avg over the same part) as a
    * pre-aggregated self-join. The threshold is bit-identical across
    * engines: quantities are integral doubles, so their sum is exact
    * under any order and avg rounds once.
    */
  val q17 = DeclaredQuery(
    "q_tpch_q17",
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  count(*) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#1'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val brandParts = Tables.part(s, d).filter(col("p_brand") === "Brand#1")
    // only Brand#1 parts survive the final join, so compute per-part
    // averages over the brand's lineitems only (left-semi before the
    // groupBy — Catalyst can't push the brand filter below the
    // aggregate itself); identical averages for the surviving keys,
    // brand-selectivity-fraction of the aggregation input.
    val partAvg = li
      .join(brandParts.select(col("p_partkey").as("bp_key")),
        col("l_partkey") === col("bp_key"), "left_semi")
      .groupBy(col("l_partkey").as("avg_partkey"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_threshold"))
    li.join(brandParts, col("p_partkey") === col("l_partkey"))
      .join(partAvg, col("l_partkey") === col("avg_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg(
        (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0)
          .as("avg_yearly"),
        count(lit(1)).as("n"))
  }

  /** Q8 national market share — previously listed as fixture-blocked,
    * but unlike Q2/9/11/12/16/20/21 it needs no partsupp /
    * l_shipmode / l_commitdate: every referenced column ships in the
    * fixtures (p_type stands in with the planted category values).
    * Plan shape: the two nation dims and region broadcast; the
    * fact-side three-way lineitem⋈orders⋈customer chain shuffles on
    * its join keys once each; conditional-ratio aggregate rides the
    * same decimal-exact pattern as Q14.
    */
  val q8 = DeclaredQuery(
    "q_tpch_q8",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(CASE WHEN n2.n_name = 'NATION_7'
      |      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))
      |      ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS DOUBLE)
      |    AS mkt_share
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
    // only the fixed-cardinality dims (nation ×2, region) are hinted
    // broadcast; part/supplier/customer grow with SF — AQE picks
    // broadcast for them when they fit, shuffle joins when they don't
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n1_region") === col("r_regionkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg((graft.functions.ExactSum.moneySum(
          "CASE WHEN nation = 'NATION_7' THEN l_extendedprice * (1 - l_discount) ELSE 0 END",
          10000L) /
        revSum).as("mkt_share"))
      .orderBy("o_year")
  }

  val all: Seq[DeclaredQuery] = Seq(
    q3, q4, q5, q6, q7, q8, q10, q13, q14, q15, q17, q18, q19, q22)
}
