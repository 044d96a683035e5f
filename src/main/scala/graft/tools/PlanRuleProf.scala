package graft.tools

import graft.{SparkEntry, SparkEnv}

/** Dev-only probe (round-16): per-RULE Catalyst time for a declared
  * query's whole run — the decomposition one level below
  * StreamPhaseProf's `queryPlanning` phase. Streaming pays the
  * analyzer+optimizer per MICRO-BATCH (IncrementalExecution re-plans
  * each trigger), and the phase tables show 60–1200 ms/batch on the
  * stream-stream joins; this tool answers WHICH rules carry it, i.e.
  * whether any is skippable for the library's stream sessions.
  *
  *   sbt "runMain graft.tools.PlanRuleProf q_stream_stream_join_wm"
  */
object PlanRuleProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_stream_stream_join_wm")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)
    import org.apache.spark.sql.catalyst.rules.RuleExecutor
    for (name <- names) {
      // warm pass: JIT + memoized artifacts out of the measurement
      spark.catalog.clearCache()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      RuleExecutor.resetMetrics()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"%n== $name wall=$wall%.3f s — top rules by exclusive time ==")
      val dump = RuleExecutor.dumpTimeSpent()
      // dumpTimeSpent is already sorted by time desc; keep the header +
      // top 40 rules to stay readable
      println(dump.linesIterator.take(46).mkString("\n"))
    }
    spark.stop()
  }
}
