package graft.tools

import graft.{SparkEntry, SparkEnv}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (round-11, VERDICT r10 task #7): a 10× synthetic EDGE
  * corpus for the iterative graph family — the one place a 100×
  * scale-up surprise would hide, because per-iteration cost compounds.
  *
  * The two existing decades under-stress exactly these operators:
  *  - [[SynthScaleFacts]] replicates lineitem with offset suppkeys →
  *    10 DISJOINT supplier-graph copies. BFS seeded at the min node
  *    expands one copy; PageRank/CC never mix mass across copies; the
  *    supplier dim was copied unchanged, so 9/10 replicas' keys miss
  *    the final top-k join.
  *  - [[SynthScale]] rotates document TEXT but copies `source`
  *    unchanged → q_domain_rank's domain graph does not grow at all
  *    (same 20 nodes; its 0.96× "decade" was vacuous).
  *
  * This corpus grows the GRAPHS honestly, connected:
  *  - lineitem: 10 replica copies (orderkey/suppkey offsets, the
  *    SynthScaleFacts recipe — vertices ×10, edges ×10, no artificial
  *    densification) PLUS deterministic bridge baskets: 64 supplier
  *    pairs per adjacent-replica boundary, each pair co-occurring in
  *    exactly EdgeSupport(=5) distinct orders, so the co-occurrence
  *    graph is one CONNECTED component of ~10× nodes and ~10× edges
  *    (+~1.2% bridges). BFS frontiers cross replicas; triangle
  *    orientation sees one big graph.
  *  - supplier: replica copies with matching offset keys, so the
  *    top-k dim join covers every replica.
  *  - documents: Caesar-rotated text (the SynthScale decorrelation,
  *    keeps q_dedup_clusters' planted dup families per-replica) PLUS
  *    a per-replica `source` suffix → 200 domains; q_domain_rank's
  *    content-hash-directed citations target the GLOBAL ranked domain
  *    dictionary, so rank mass flows across replicas — nodes ×10,
  *    edges ×10, connected.
  *
  *   sbt "runMain graft.tools.SynthScaleGraph [query ...]"
  */
object SynthScaleGraph {
  private val defaults = Seq(
    "q_triangle_count", "q_bfs_hops", "q_domain_rank", "q_dedup_clusters")

  private val replicas = 10
  private val okOffset = 10000000L
  private val idOffset = 1000000L
  private val bridgeOk = 900000000L
  private val bridgePairs = 64
  private val bridgeOrders = 5 // = GraphOps.EdgeSupport

  def synthesize(spark: SparkSession, base: String, out: String): Unit = {
    // --- lineitem: replica copies + cross-replica bridge baskets ---
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    val liReplicas = (0 until replicas).map { r =>
      li.select(
        (col("l_orderkey") + lit(r * okOffset)).as("l_orderkey"),
        col("l_partkey"),
        (col("l_suppkey") + lit(r * idOffset)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }
    val sup = spark.read.parquet(s"$base/supplier.parquet")
    val (minSupp, nSupp) = {
      val r = sup.agg(min("s_suppkey"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    // bridge basket b = (boundary r, pair p, order o): two line items
    // joining supplier (p mod n) of replica r-1 with supplier
    // (p·7+3 mod n) of replica r; each pair repeats in bridgeOrders
    // distinct orders so it clears the EdgeSupport floor
    val bridgeKeys = spark.range((replicas - 1).toLong * bridgePairs * bridgeOrders)
      .select(
        (col("id") / (bridgePairs * bridgeOrders)).cast("long").as("r"),
        (col("id") / bridgeOrders % bridgePairs).cast("long").as("p"),
        (lit(bridgeOk) + col("id")).as("l_orderkey"))
    val bridgeRows = bridgeKeys.select(col("l_orderkey"),
        explode(array(
          lit(minSupp) + pmod(col("p"), lit(nSupp)) + col("r") * idOffset,
          lit(minSupp) + pmod(col("p") * 7 + 3, lit(nSupp)) + (col("r") + 1) * idOffset))
          .as("l_suppkey"))
    val bridgeLi = bridgeRows.select(li.schema.fieldNames.map {
      case "l_orderkey" => col("l_orderkey").cast(li.schema("l_orderkey").dataType).as("l_orderkey")
      case "l_suppkey" => col("l_suppkey").cast(li.schema("l_suppkey").dataType).as("l_suppkey")
      case f => lit(null).cast(li.schema(f).dataType).as(f)
    }: _*)
    (liReplicas :+ bridgeLi).reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/lineitem.parquet")
    // --- supplier: replica copies with matching offset keys ---
    (0 until replicas).map { r =>
      sup.select(
        (col("s_suppkey") + lit(r * idOffset)).as("s_suppkey"),
        concat(col("s_name"), lit(s"#r$r")).as("s_name"),
        col("s_nationkey"), col("s_acctbal"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")
    // --- documents: rotated text + per-replica domain suffix ---
    val abc = "abcdefghijklmnopqrstuvwxyz"
    val docs = spark.read.parquet(s"$base/documents.parquet")
    (0 until replicas).map { r =>
      val rotated = abc.drop(r) + abc.take(r)
      docs.select(
        (col("doc_id") + lit(r * okOffset)).as("doc_id"),
        translate(col("text"), abc, rotated).as("text"),
        col("lang"),
        concat(col("source"), lit(s"_r$r")).as("source"),
        col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    // dimensions the four queries join, copied unchanged
    for (t <- Seq("region", "nation", "customer", "part", "orders",
        "events", "embeddings")) {
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else defaults
    val base = "/root/testdata/sf0.1"
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_GRAPH_DIR",
      SparkEnv.scratchRoot + "/synth-sf1-graph")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!new java.io.File(s"$out/documents.parquet").exists())
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
      "(10× connected graph; > 10× flags super-linear growth)")
    spark.stop()
  }
}
