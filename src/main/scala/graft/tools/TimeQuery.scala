package graft.tools

import graft.{SparkEntry, SparkEnv}

/** Dev harness: time a subset of declared queries with the same
  * protocol as [[graft.Bench]] (CPU warm-up, clearCache before every
  * timed run, 2-pass per-query min). Usage:
  *
  *   sbt "runMain graft.tools.TimeQuery q_language_id q_ann_ivf"
  *
  * Optional env SPARK_GRAFT_SF_DIR (default sf0.1) and
  * SPARK_GRAFT_PASSES (default 2).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      spark.read.parquet(s"$sfDir/region.parquet").count()
      graft.Bench.warmCpu(spark)
    } catch { case _: Throwable => }
    val acc = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    val failed = scala.collection.mutable.Set[String]()
    for (p <- 1 to passes; name <- names) {
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true } // full declared plan (see Bench)
            catch { case e: Throwable => println(s"FAIL $name: $e"); false }
          val t = (System.nanoTime() - t0) / 1e9
          if (ok) acc(name) = math.min(acc(name), t) else failed += name
          println(f"pass $p $name%-28s $t%8.3f s")
        case None => println(s"unknown query: $name")
      }
    }
    println("--- per-query min ---")
    acc.toSeq.sortBy(-_._2).foreach { case (n, t) => println(f"$t%8.3f  $n") }
    // a query failing EVERY pass never enters acc — name it loudly so
    // the min table can't overstate suite health
    val neverPassed = failed.toSet -- acc.keySet
    if (neverPassed.nonEmpty)
      println(s"FAILED (no successful pass): ${neverPassed.toSeq.sorted.mkString(", ")}")
    spark.stop()
  }
}
