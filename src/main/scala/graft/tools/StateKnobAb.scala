package graft.tools

import graft.{SparkEntry, SparkEnv}

/** Dev-only SAME-JVM interleaved A/B of state-store session knobs on
  * declared streaming queries, via the `graft.test.stateExtraConf`
  * hook in SparkEnv.stateSession (cross-JVM timing is noise-bound on
  * this host — see OPTIMIZATION_r15.md). Usage:
  *
  *   SPARK_GRAFT_KNOB="spark.sql...rocksdb.changelogCheckpointing.enabled=true" \
  *   SPARK_GRAFT_PASSES=3 sbt "runMain graft.tools.StateKnobAb q_a q_b"
  *
  * Variant A = library defaults; variant B = defaults + the knob.
  */
object StateKnobAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val knob = sys.env.getOrElse("SPARK_GRAFT_KNOB",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true")
    val names = args.toSeq
    require(names.nonEmpty, "pass query names")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)
    val acc = scala.collection.mutable.Map[(String, Boolean), Double]()
      .withDefaultValue(Double.MaxValue)
    for (p <- 1 to passes; b <- Seq(false, true); name <- names) {
      if (b) System.setProperty("graft.test.stateExtraConf", knob)
      else System.clearProperty("graft.test.stateExtraConf")
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val ok = try {
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(); true
      } catch { case e: Throwable => println(s"FAIL $name ($b): $e"); false }
      val t = (System.nanoTime() - t0) / 1e9
      if (ok) acc((name, b)) = math.min(acc((name, b)), t)
      println(f"pass $p ${if (b) "B" else "A"} $name%-30s $t%8.3f s")
    }
    System.clearProperty("graft.test.stateExtraConf")
    println(s"--- per-query min: A(default) vs B($knob) ---")
    names.foreach { n =>
      val (a, b) = (acc((n, false)), acc((n, true)))
      println(f"$n%-34s A=$a%7.3f B=$b%7.3f d=${b - a}%+7.3f")
    }
    spark.stop()
  }
}
