package graft.tools

import graft.SparkEnv
import graft.streaming.{InMemoryServingStore, Serving, StreamMetrics}

/** Dev tool (round-8 verdict #8): streaming analog of [[ScaleSweep]] —
  * run the metered streaming pipelines at sf0.001/0.01/0.1 and report
  * how STATE (rows + bytes), input rows, and wall time grow with the
  * input decade. The batch sweep proves plans stay linear; this one
  * proves state stays bounded by the KEY SPACE (hours × types;
  * accounts × types × days), not by input rows — the invariant that
  * decides whether a streaming job survives at 100 TB.
  *
  *   sbt "runMain graft.tools.StreamScaleSweep"
  */
object StreamScaleSweep {
  def main(args: Array[String]): Unit = {
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      graft.Bench.warmCpu(spark)
    } catch { case _: Throwable => }

    val pipelines: Seq[(String, String => Seq[StreamMetrics.BatchMetrics])] = Seq(
      "q_stream_hourly_counters" -> { sf =>
        Serving.runPipelineMetered(spark, sf, new InMemoryServingStore,
          SparkEnv.scratchDir("sweep-hourly"))._2
      },
      "q_stream_account_daily" -> { sf =>
        Serving.runAccountPipelineMetered(spark, sf, new InMemoryServingStore,
          SparkEnv.scratchDir("sweep-acct"))._2
      },
      // transformWithState custom state (RocksDB): one carried
      // interval per user — state must track ACCOUNTS, not events
      "q_stream_time_weighted" -> { sf =>
        graft.streaming.TimeWeighted.dailyReportMetered(spark, sf)._2
      })

    println("| pipeline | sf | input rows | state rows | state MB | wall s |")
    println("|---|---|---|---|---|---|")
    val summary = for ((name, run) <- pipelines) yield {
      val rows = sfs.map { sf =>
        val t0 = System.nanoTime()
        val ms = run(sf)
        val wall = (System.nanoTime() - t0) / 1e9
        val input = ms.map(_.numInputRows).sum
        val stateRows = ms.flatMap(_.stateOperators.map(_.numRowsTotal))
          .maxOption.getOrElse(0L)
        val stateBytes = ms.flatMap(_.stateOperators.map(_.memoryUsedBytes))
          .maxOption.getOrElse(0L)
        println(f"| $name | ${sf.split('/').last} | $input | $stateRows | " +
          f"${stateBytes / 1e6}%.2f | $wall%.2f |")
        (input, stateRows, wall)
      }
      val inputDecade = rows(2)._1.toDouble / rows(1)._1
      val stateDecade = rows(2)._2.toDouble / rows(1)._2
      val wallDecade = rows(2)._3 / rows(1)._3
      (name, inputDecade, stateDecade, wallDecade)
    }
    println()
    println("| pipeline | input 0.01→0.1 | state 0.01→0.1 | wall 0.01→0.1 |")
    println("|---|---|---|---|")
    summary.foreach { case (n, i, s, w) =>
      println(f"| $n | $i%.1f× | $s%.2f× | $w%.2f× |")
    }
    spark.stop()
  }
}
