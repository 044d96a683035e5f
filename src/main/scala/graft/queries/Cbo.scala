package graft.queries

import graft.DeclaredQuery
import org.apache.spark.sql.SparkSession

/** Cost-based-optimizer exercise (round-8 verdict #4): catalog tables
  * with ANALYZE'd column statistics, a multi-join query planned under
  * `spark.sql.cbo.enabled` + `joinReorder.enabled`, and a PlanSpec
  * assertion that the stats-driven join order actually DIFFERS from
  * the syntactic order (CboSpec) while the value gate stays the plain
  * DuckDB replay.
  *
  * Why this matters at 100 TB: every other declared query hand-orders
  * its joins (broadcast hints, dimension-first chains) because the
  * fixture shapes are known. A production warehouse cannot hand-order
  * ad-hoc queries — it runs ANALYZE after ingest and lets the
  * optimizer's dynamic-programming join reorder pick the
  * minimum-intermediate-cardinality order from row counts + NDVs.
  * This module proves the engine's tables, stats plumbing, and
  * planner flags actually compose: the declared query is WRITTEN
  * fact-first (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region — the
  * worst syntactic order, biggest relations first) and the CBO is
  * what turns it into the selective-dimension-first plan every
  * hand-tuned query here encodes manually.
  *
  * Catalog mechanics: external parquet tables over the immutable
  * fixture files (metadata only — no copy), names suffixed with the
  * sf dir so stats from different scales never cross-contaminate.
  * ANALYZE ... FOR COLUMNS computes table rowCount/size plus per-key
  * NDV/min/max — one scan per table, paid once per JVM (memoized),
  * exactly like a warehouse's post-ingest stats job.
  */
object Cbo {

  /** Per-parent CBO session: same shared catalog (so the ANALYZE'd
    * tables resolve), isolated conf with the cost-based flags on.
    * Memoized — Bench calls the query fn once per pass.
    */
  private val cboSessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  def cboSession(parent: SparkSession): SparkSession =
    cboSessions.computeIfAbsent(parent, p => {
      val c = p.newSession()
      c.conf.set("spark.sql.cbo.enabled", "true")
      c.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      c
    })

  /** Tables whose (table, column) stats the reorder query needs.
    * o_orderdate is deliberately NOT analyzed: it is timestamp_ntz in
    * the fixtures and Spark 4.1.2's FilterEstimation.evaluateBinary
    * has no TimestampNTZType branch — column stats on it make stats
    * estimation throw a MatchError inside optimization (measured
    * 2026-08-14; plain TimestampType would be fine). Without column
    * stats the date predicate falls back to default selectivity,
    * which is enough for the reorder: rowCounts + join-key NDVs drive
    * the DP order.
    */
  private val statCols: Seq[(String, Seq[String])] = Seq(
    "lineitem" -> Seq("l_orderkey", "l_extendedprice", "l_discount"),
    "orders"   -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey", "c_nationkey"),
    "nation"   -> Seq("n_nationkey", "n_regionkey", "n_name"),
    "region"   -> Seq("r_regionkey", "r_name"))

  // keyed by (sharedState identity, table): the catalog is per
  // SharedState, so a fresh context must re-register even in one JVM
  private val analyzed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register + ANALYZE the fixture table in the session catalog;
    * returns its catalog name. Idempotent per (context, sf).
    */
  def statsTable(s: SparkSession, d: String, name: String,
      cols: Seq[String]): String = {
    val t = s"cbo_${name}_" + d.replaceAll("[^A-Za-z0-9]", "_")
    val key = System.identityHashCode(s.sharedState) + "/" + t
    // latch AFTER the DDL succeeds (round-10, ADVICE r9): marking the
    // key done up front meant a throwing CREATE/ANALYZE left every
    // later call silently skipping registration — a confusing
    // missing-table failure far from the cause. The monitor also
    // stops a concurrent caller from planning against a half-ANALYZEd
    // table (Verify runs queries 4-way concurrent).
    if (!analyzed.contains(key)) analyzed.synchronized {
      if (!analyzed.contains(key)) {
        s.sql(s"CREATE TABLE IF NOT EXISTS $t USING parquet " +
          s"LOCATION '$d/$name.parquet'")
        s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS " +
          cols.mkString(", "))
        analyzed.add(key)
      }
    }
    t
  }

  /** The reorder query text over the ANALYZE'd catalog tables —
    * exposed so CboSpec can plan the IDENTICAL text with and without
    * CBO and compare join orders. Syntactic order is deliberately
    * fact-first; only the WHERE carries selectivity.
    */
  def reorderSql(s: SparkSession, d: String): String = {
    val t = statCols.map { case (n, cols) => n -> statsTable(s, d, n, cols) }.toMap
    s"""SELECT n_name, count(*) AS n_items,
       |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4)))
       |       AS DOUBLE) AS revenue
       |FROM ${t("lineitem")}
       |JOIN ${t("orders")} ON l_orderkey = o_orderkey
       |JOIN ${t("customer")} ON o_custkey = c_custkey
       |JOIN ${t("nation")} ON c_nationkey = n_nationkey
       |JOIN ${t("region")} ON n_regionkey = r_regionkey
       |WHERE r_name = 'EUROPE'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin
  }

  val qCboJoinReorder = DeclaredQuery(
    "q_cbo_join_reorder",
    """SELECT n_name, count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4)))
      |       AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (s, d) =>
    cboSession(s).sql(reorderSql(s, d))
  }

  /** Session with the bloom runtime filter live at fixture scale:
    * thresholds lowered from the 10 GB deployment default, broadcast
    * off (the rule only fires for probable shuffle joins — the
    * both-sides-huge regime it exists for). Memoized like cboSession.
    */
  private val rfSessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  def runtimeFilterSession(parent: SparkSession): SparkSession =
    rfSessions.computeIfAbsent(parent, p => {
      val c = p.newSession()
      c.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "1KB")
      c.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c
    })

  /** Declared runtime-filter query (round 9): per-order revenue
    * rollup (the fact-side shuffle) joined to a selectively-filtered
    * dim. Under [[runtimeFilterSession]] the optimizer injects a
    * bloom_filter_agg on the dim side and a might_contain probe BELOW
    * the fact aggregate — rows for non-urgent orders never enter the
    * shuffle. At 100 TB that filter removes ~60% of the fact shuffle
    * for a 2-of-5 priority slice; RuntimeFilterSpec pins the plan
    * shape and its measured preconditions (the application side must
    * already shuffle; broadcast-able joins are excluded). The oracle
    * replays the semantics — the rewrite must be invisible in values.
    */
  val qRuntimeFilterJoin = DeclaredQuery(
    "q_runtime_filter_join",
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(order_rev) AS DOUBLE) AS revenue
      |FROM (SELECT l_orderkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS order_rev
      |      FROM lineitem GROUP BY 1) r
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM')
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.functions._
    val s2 = runtimeFilterSession(s)
    // Tables.load, not a raw read: the loader's compacted 16-way
    // layout parallelizes the fact scan+partial-agg (the raw fixture
    // is ONE row group = one core); the bloom rule still fires — the
    // compacted dir is far above the 1KB application-side threshold
    val perOrder = graft.Tables.lineitem(s2, d)
      .groupBy("l_orderkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("order_rev"))
    val urgent = graft.Tables.orders(s2, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "3-MEDIUM"))
      .select("o_orderkey", "o_orderpriority")
    perOrder.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum("order_rev").cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  val all: Seq[DeclaredQuery] = Seq(qCboJoinReorder, qRuntimeFilterJoin)
}
