package graft.tools

import graft.SparkEnv
import graft.streaming.{InMemoryServingStore, Serving, StreamMetrics}

/** Dev-only probe for the round-15 optimization: per-batch metrics of
  * the watermarked hourly-counter pipeline with the trailing no-data
  * micro-batch ON vs OFF, interleaved in ONE JVM (cross-JVM timing is
  * noise-bound on this host). The no-data batch exists only to
  * advance the watermark and evict state in an UPDATE-mode
  * aggregation — it emits zero rows, so skipping it cannot change the
  * store contents; this probe shows its wall cost.
  */
object NoDataBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)
    val best = scala.collection.mutable.Map[Boolean, Double]()
      .withDefaultValue(Double.MaxValue)
    val hist = scala.collection.mutable.Map[Boolean, Seq[StreamMetrics.BatchMetrics]]()
    for (p <- 1 to passes; noData <- Seq(true, false)) {
      System.setProperty("graft.test.noDataBatches", noData.toString)
      val t0 = System.nanoTime()
      val (store, h) = Serving.runPipelineMetered(spark, sfDir,
        new InMemoryServingStore, SparkEnv.scratchDir(s"ndprobe-$noData"))
      val t = (System.nanoTime() - t0) / 1e9
      best(noData) = math.min(best(noData), t)
      hist(noData) = h
      println(f"pass $p noData=$noData%-5s wall $t%7.3f s " +
        s"batches=${h.size} rows=${h.map(_.numInputRows).mkString(",")} " +
        s"durMs=${h.map(_.batchDurationMs).mkString(",")} " +
        s"storeKeys=${store.snapshot().size}")
    }
    System.clearProperty("graft.test.noDataBatches")
    println(f"min wall: noData=true ${best(true)}%7.3f  noData=false ${best(false)}%7.3f")
    spark.stop()
  }
}
