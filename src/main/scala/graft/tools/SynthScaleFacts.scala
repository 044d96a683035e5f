package graft.tools

import graft.{SparkEntry, SparkEnv}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool, round-9 session 4: the fact-table counterpart of
  * [[SynthScale]] (which covers documents/embeddings). Synthesizes an
  * sf~1 decade for the TPC-H-shaped and events-shaped queries by
  * replica-unioning the sf0.1 facts with KEY offsets, then times each
  * query at sf0.1 vs sf~1.
  *
  * Offset design = what honestly grows at 10× scale:
  *  - l_orderkey / o_orderkey, l_suppkey, o_custkey / c_custkey,
  *    event_id / user_id all offset per replica — orders, the
  *    supplier co-occurrence graph (10 disjoint copies: vertices and
  *    edges ×10, no artificial densification — the dishonest
  *    alternative, shared suppkeys, would 10×-densify every basket
  *    and grow edges ~100×), customers, and users are scaling
  *    dimensions;
  *  - part keys, brands, event types, timestamps unchanged —
  *    dimensions and calendars do NOT grow with facts.
  *  - event_id offsets are NOT multiples of 29, so q_interpolate's
  *    deterministic thinning keeps selecting ~1/29 of each replica.
  *
  * Parquet is written with repartition(32), so the synthetic decade
  * also removes the sf0.1 single-row-group scan bottleneck — the
  * measured ratio is the honest many-file scan shape, closer to the
  * 100 TB layout than the one-file fixtures.
  *
  *   sbt "runMain graft.tools.SynthScaleFacts [query ...]"
  */
object SynthScaleFacts {
  private val defaults = Seq(
    "q_pricing_summary", "q_tpch_q18", "q_brand_affinity",
    "q_triangle_count", "q_bfs_hops",
    "q_iqr_outliers", "q_welch_ttest", "q_ks_test", "q_interpolate",
    "q_incremental_rollup", "q_session_windows", "q_autocorrelation",
    "q_mad",
    // round-10 (VERDICT r9 task #7): the rest of the round-9
    // statistics batch — all fact-shaped (events/customer/lineitem),
    // so this decade is the honest one for them. q_pmi is
    // documents-shaped and rides tools/SynthScale instead.
    "q_psi_drift", "q_benford", "q_concentration", "q_stats_funcs",
    "q_type_correlation", "q_math_funcs", "q_heavy_hitters")

  private val replicas = 10
  private val okOffset = 10000000L // orderkeys (max ~600k at sf0.1)
  private val idOffset = 1000000L  // supp/cust/user keys

  def synthesize(spark: SparkSession, base: String, out: String): Unit = {
    def rep(table: String, cols: Int => Seq[org.apache.spark.sql.Column]): Unit = {
      val df = spark.read.parquet(s"$base/$table.parquet")
      (0 until replicas).map(r => df.select(cols(r): _*))
        .reduce(_ unionByName _)
        .repartition(32).write.mode("overwrite")
        .parquet(s"$out/$table.parquet")
    }
    rep("lineitem", r => Seq(
      (col("l_orderkey") + lit(r * okOffset)).as("l_orderkey"),
      col("l_partkey"),
      (col("l_suppkey") + lit(r * idOffset)).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")))
    rep("orders", r => Seq(
      (col("o_orderkey") + lit(r * okOffset)).as("o_orderkey"),
      (col("o_custkey") + lit(r * idOffset)).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")))
    rep("customer", r => Seq(
      (col("c_custkey") + lit(r * idOffset)).as("c_custkey"),
      col("c_name"), col("c_nationkey"), col("c_acctbal"),
      col("c_mktsegment")))
    rep("events", r => Seq(
      (col("event_id") + lit(r * 100000000L)).as("event_id"),
      col("ts"),
      (col("user_id") + lit(r * idOffset)).as("user_id"),
      col("event_type"), col("value"), col("props")))
    // dimensions copied unchanged (queries join them by key)
    for (t <- Seq("region", "nation", "supplier", "part", "documents",
      "embeddings")) {
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else defaults
    val base = "/root/testdata/sf0.1"
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_FACTS_DIR",
      SparkEnv.scratchRoot + "/synth-sf1-facts")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!new java.io.File(s"$out/events.parquet").exists())
      synthesize(spark, base, out)
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      graft.Bench.warmCpu(spark)
    } catch { case _: Throwable => }
    val passes = 2
    println("| query | sf0.1 s | sf~1 s | decade ratio | rows 0.1 | rows 1 |")
    println("|---|---|---|---|---|---|")
    var worst = ("", 0.0)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      def run(sf: String): (Double, Long) = {
        var rows = 0L
        val t = (1 to passes).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          rows = fn(spark, sf).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }.min
        (t, rows)
      }
      val (t01, r01) = run(base)
      val (t1, r1) = run(out)
      val ratio = t1 / t01
      if (ratio > worst._2) worst = (name, ratio)
      println(f"| $name | $t01%.3f | $t1%.3f | $ratio%.2f× | $r01 | $r1 |")
    }
    println(f"\nworst decade ratio: ${worst._1} at ${worst._2}%.2f× " +
      "(10× facts; > 10× flags super-linear growth)")
    spark.stop()
  }
}
