package graft.tools

import graft.streaming.{InMemoryServingStore, ParquetServingStore, Serving}

/** Dev-only phase breakdown of q_stream_account_daily's replay: print
  * every micro-batch's StreamingQueryProgress durationMs map (trigger
  * phases: addBatch, getBatch, latestOffset, queryPlanning,
  * walCommit, commitOffsets) plus state-operator metrics, to see
  * where the ~2 s single-batch replay actually goes.
  */
object AcctPhaseProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)
    for (p <- 1 to 2) {
      val ckpt = graft.SparkEnv.scratchDir(s"acct-phase-ckpt-$p")
      val agg = Serving.accountDailyCounters(
        graft.streaming.Ingest.eventStream(spark.newSession() match { case s2 =>
          s2.conf.set("spark.sql.shuffle.partitions", graft.SparkEnv.stateParts)
          s2
        }, sfDir))
      val store = new InMemoryServingStore
      val t0 = System.nanoTime()
      val q = agg.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          store.sinkBatch(Serving.keyedAccountCounters(batch), batchId)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"[acctphase] pass $p total=$total%.3f s")
      q.recentProgress.foreach { pr =>
        val dur = pr.durationMs
        println(s"  batch ${pr.batchId}: rows=${pr.numInputRows} " +
          s"durations=${new java.util.TreeMap[String, java.lang.Long](dur)}")
        pr.stateOperators.foreach { so =>
          println(s"    state: rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"commitMs=${so.commitTimeMs} mem=${so.memoryUsedBytes}")
        }
      }
    }
    spark.stop()
  }
}
