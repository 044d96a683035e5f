package graft.tools

import graft.{SparkEntry, SparkEnv}

/** Dev-only phase profiler for the headline-gap hunt (round-7 verdict
  * #7): splits each query's wall time into plan-side phases —
  * construction (DSL → analyzed), optimize+physical planning, and
  * execution (toRdd.count) — across repeated runs, so fixed per-query
  * overhead (analysis, codegen compile, job scheduling) is separable
  * from actual compute. Usage:
  *
  *   sbt "runMain graft.tools.PhaseProf q_window_rank q_pricing_summary"
  */
object PhaseProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_pricing_summary", "q_join_star", "q_topk_customers",
        "q_window_rank", "q_events_hourly", "q_events_distinct_users_daily",
        "q_json_extract", "q_docs_by_lang", "q_semi_join", "q_setop")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      spark.read.parquet(s"$sfDir/region.parquet").count()
      graft.Bench.warmCpu(spark)
    } catch { case _: Throwable => }
    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    println(f"${"query"}%-30s pass  build   plan    exec    total")
    for (name <- names; pass <- 1 to 3) {
      spark.catalog.clearCache()
      val (tb, df) = t(SparkEntry.queries(name)(spark, sfDir))
      val (tp, _) = t(df.queryExecution.executedPlan)
      val (te, _) = t(df.queryExecution.toRdd.count())
      println(f"$name%-30s $pass%4d ${tb}%6.3f ${tp}%6.3f ${te}%6.3f ${tb + tp + te}%6.3f")
    }
    spark.stop()
  }
}
