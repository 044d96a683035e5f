package graft.tools
import graft.{SparkEntry, SparkEnv}
/** Dev harness: quantifies how much a bare `.count()` undercounts the
  * declared plan (Catalyst prunes the query's aggregates/sorts under
  * count) vs `queryExecution.toRdd.count()` — the measurement behind
  * Bench's full-plan timing choice.
  */
object BenchCmp {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { spark.range(1000).selectExpr("sum(id)").count(); graft.Bench.warmCpu(spark) } catch { case _: Throwable => }
    val names = Seq("q_events_hourly", "q_pricing_summary", "q_window_rank", "q_tpch_q3", "q_sliding_windows")
    for (p <- 1 to 2; name <- names) {
      spark.catalog.clearCache()
      val fn = SparkEntry.queries(name)
      var t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val tCount = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val tFull = (System.nanoTime() - t0) / 1e9
      println(f"[cmp] pass $p $name%-22s count=$tCount%6.3f full=$tFull%6.3f")
    }
    spark.stop()
  }
}
