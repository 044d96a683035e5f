package graft.tools

import graft.streaming.{InMemoryServingStore, Serving}

/** Dev-only A/B: the streaming counter pipelines' wall-clock vs the
  * state-partition count (SPARK_GRAFT_STATE_PARTITIONS default), in
  * ONE JVM interleaved — each stateful aggregation opens/commits one
  * state store per partition per micro-batch, so at fixture scale the
  * partition count is mostly fixed overhead. Usage:
  *   sbt "runMain graft.tools.StreamProf /root/testdata/sf0.1"
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = graft.SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)

    def timeRun(parts: String, pipeline: String): Double = {
      val prev = System.getProperty("graft.test.stateParts")
      // Serving.stateSession reads the env knob; property override for A/B
      System.setProperty("graft.test.stateParts", parts)
      try {
        val t0 = System.nanoTime()
        val ckpt = graft.SparkEnv.scratchDir(s"sprof-$pipeline-$parts")
        pipeline match {
          case "hourly" =>
            Serving.runPipeline(spark, sfDir, new InMemoryServingStore, ckpt)
          case "acct" =>
            Serving.runAccountPipeline(spark, sfDir, new InMemoryServingStore, ckpt)
        }
        (System.nanoTime() - t0) / 1e9
      } finally {
        if (prev == null) System.clearProperty("graft.test.stateParts")
        else System.setProperty("graft.test.stateParts", prev)
      }
    }

    val best = scala.collection.mutable.Map[(String, String), Double]()
      .withDefaultValue(Double.MaxValue)
    for (_ <- 1 to passes; parts <- Seq("2", "4", "8", "16");
         p <- Seq("hourly", "acct")) {
      val t = timeRun(parts, p)
      best((p, parts)) = math.min(best((p, parts)), t)
    }
    for (p <- Seq("hourly", "acct"); parts <- Seq("2", "4", "8", "16"))
      println(f"[sprof] $p%-8s parts=$parts%-3s ${best((p, parts))}%8.3f s")
    spark.stop()
  }
}
