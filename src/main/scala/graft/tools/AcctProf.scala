package graft.tools

import graft.streaming.{InMemoryServingStore, ParquetServingStore, Serving}

/** Dev-only decomposition of q_stream_account_daily (the bench's top
  * line): streaming replay with the InMemory store vs the durable
  * ParquetServingStore sink, and the store's read-back cost alone —
  * separates inherent replay cost from the durable-path premium.
  */
object AcctProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)
    def time(label: String)(f: => Any): Unit = (1 to 3).foreach { p =>
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-36s pass$p ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    time("replay -> InMemory store") {
      Serving.runAccountPipeline(spark, sfDir, new InMemoryServingStore,
        graft.SparkEnv.scratchDir("acctprof-mem"))
    }
    var lastStore: ParquetServingStore = null
    time("replay -> ParquetServingStore") {
      val store = new ParquetServingStore(spark,
        graft.SparkEnv.scratchDir("acctprof-pq"))
      Serving.runAccountPipeline(spark, sfDir, store,
        graft.SparkEnv.scratchDir("acctprof-pq-ckpt"))
      lastStore = store
    }
    time("store.latest() read-back only") {
      lastStore.latest().queryExecution.toRdd.count()
    }
    time("full declared q_stream_account_daily") {
      graft.SparkEntry.queries("q_stream_account_daily")(spark, sfDir)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
