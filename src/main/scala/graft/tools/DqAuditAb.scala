package graft.tools

import graft.{SparkEnv, Tables}

/** Dev-only same-JVM interleaved A/B for the round-16 q_dq_audit
  * orders-leg fusion (guide §1 discipline — cross-JVM deltas are
  * noise-bound on this host): times the fused shape (one orders scan
  * feeds both the dup-key and null-custkey checks) against the
  * pre-round shape (two separate orders scans), asserts row-identical
  * results every pass, and prints per-variant mins.
  *
  *   sbt "runMain graft.tools.DqAuditAb"
  */
object DqAuditAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)
    def mk(fused: Boolean) = {
      val (o, l, c) = (Tables.orders(spark, sfDir),
        Tables.lineitem(spark, sfDir), Tables.customer(spark, sfDir))
      if (fused) graft.queries.Maintenance.dqAudit(o, l, c)
      else graft.queries.Maintenance.dqAuditUnfused(o, l, c)
    }
    // result parity first (the oracle re-checks at both sfs; this is
    // the fast in-harness guard)
    val a = mk(fused = true).collect().map(_.toString).toSeq
    val b = mk(fused = false).collect().map(_.toString).toSeq
    require(a == b, s"FUSION CHANGED THE RESULT:\nfused=$a\nunfused=$b")
    println(s"results identical (${a.size} rows): ${a.mkString(", ")}")
    val best = scala.collection.mutable.Map[Boolean, Double]()
      .withDefaultValue(Double.MaxValue)
    for (p <- 1 to passes; fused <- Seq(true, false)) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      mk(fused).queryExecution.toRdd.count()
      val t = (System.nanoTime() - t0) / 1e9
      best(fused) = math.min(best(fused), t)
      println(f"pass $p fused=$fused%-5s $t%7.3f s")
    }
    println(f"min: fused=${best(true)}%.3f s  unfused=${best(false)}%.3f s")
    spark.stop()
  }
}
