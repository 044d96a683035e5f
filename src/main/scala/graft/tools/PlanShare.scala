package graft.tools

import graft.{SparkEntry, SparkEnv}

/** Dev-only: split a declared query's warm wall time into
  * (a) DataFrame construction, (b) analysis+optimization+physical
  * planning (forcing executedPlan), and (c) execution (toRdd.count),
  * to see whether the mid-band per-query floor is planner or runtime.
  *
  *   sbt "runMain graft.tools.PlanShare q_setop q_semi_join ..."
  */
object PlanShare {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)
    println(f"${"query"}%-30s ${"build"}%8s ${"plan"}%8s ${"exec"}%8s ${"total"}%8s")
    for (name <- args; pass <- 1 to 3) {
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analyze/optimize/plan
      val t2 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t3 = System.nanoTime()
      if (pass == 3) // warm pass only
        println(f"$name%-30s ${(t1 - t0) / 1e9}%8.3f ${(t2 - t1) / 1e9}%8.3f ${(t3 - t2) / 1e9}%8.3f ${(t3 - t0) / 1e9}%8.3f")
    }
    spark.stop()
  }
}
