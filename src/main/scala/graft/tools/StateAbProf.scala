package graft.tools

import graft.{SparkEntry, SparkEnv}

/** Dev tool (round 13, VERDICT r12 #5): state-store provider A/B for
  * the heavy stateful streaming twins — HDFS-backed (in-heap map, the
  * session default) vs RocksDB — via the `graft.test.stateProvider`
  * sys-prop that [[graft.SparkEnv.stateSession]] honors. The
  * transformWithState pipelines (q_stream_abandoned_sessions, the
  * dedup/semantic streams) REQUIRE RocksDB and have no A/B.
  * Per-query min over `passes` alternating passes (provider-major, so
  * a host load spike cannot poison one provider's every sample).
  *
  *   sbt "runMain graft.tools.StateAbProf [passes]"
  */
object StateAbProf {
  private val targets = Seq(
    "q_stream_hourly_counters", "q_stream_multigran_counters",
    "q_stream_account_daily", "q_stream_dedup_users",
    "q_stream_stream_join",
    // sketch-state pipelines: few keys, KB-sized serialized buffers —
    // the opposite state shape from the counter cubes
    "q_stream_unique_users", "q_stream_value_percentiles",
    "q_stream_top_types_hourly")

  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)
    val results = scala.collection.mutable.Map[(String, String), Double]()
    try {
      for (_ <- 1 to passes; provider <- Seq("default", "rocksdb")) {
        if (provider == "rocksdb") sys.props("graft.test.stateProvider") = "rocksdb"
        else sys.props.remove("graft.test.stateProvider")
        for (name <- targets) {
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          // a failed leg is recorded as absent, not fatal: the summary
          // must survive one provider's crash (round-13 review)
          try {
            SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
            val t = (System.nanoTime() - t0) / 1e9
            val k = (name, provider)
            results(k) = math.min(results.getOrElse(k, Double.MaxValue), t)
          } catch {
            case e: Throwable =>
              System.err.println(s"[stateab] $name/$provider failed: ${e.getMessage}")
          }
        }
      }
    } finally sys.props.remove("graft.test.stateProvider")
    println("| query | HDFS-backed s | RocksDB s | rocks/hdfs |")
    println("|---|---|---|---|")
    for (name <- targets) {
      (results.get((name, "default")), results.get((name, "rocksdb"))) match {
        case (Some(h), Some(r)) =>
          println(f"| $name | $h%.2f | $r%.2f | ${r / h}%.2f× |")
        case (h, r) =>
          println(s"| $name | ${h.fold("FAILED")(v => f"$v%.2f")} | " +
            s"${r.fold("FAILED")(v => f"$v%.2f")} | — |")
      }
    }
    spark.stop()
  }
}
