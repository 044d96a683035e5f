package graft.tools

import graft.SparkEnv
import graft.streaming.{InMemoryServingStore, Serving, StreamMetrics, TimeWeighted}
import org.apache.spark.sql.functions._

/** Dev tool (round-10, VERDICT r9 task #4): MEASURE the streaming
  * amortization claim instead of arguing it. The BASELINE_full
  * streaming-twin ratio (~14× vs DuckDB replaying the same SQL) was
  * defended as fixed micro-batch machinery — checkpoint init, state
  * store setup, sink store, read-back — amortized away by any
  * actually-running stream. If that is true, the MARGINAL cost of a
  * micro-batch in an already-running stream must be ≈ the data cost,
  * not the machinery cost.
  *
  * Protocol: split the sf0.1 events fixture into N time-ordered
  * chunks written as separate files of one directory; run each
  * metered pipeline over it with
  * `spark.graft.stream.maxFilesPerTrigger=1` (AvailableNow then
  * processes one chunk per micro-batch — N real batches through the
  * same checkpoint/state machinery), and compare per-row cost of
  * batches 2..N against the per-row cost of the SAME pipeline run
  * one-shot (all files in one batch, the BENCH posture). Batch 1 is
  * excluded from the marginal estimate on both sides — it carries the
  * one-time costs by construction.
  *
  *   sbt "runMain graft.tools.StreamAmortProf [nChunks]"
  */
object StreamAmortProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nChunks = if (args.nonEmpty) args(0).toInt else 6
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      graft.Bench.warmCpu(spark)
    } catch { case _: Throwable => }

    // chunked twin of the fixture: <scratch>/events.parquet/ as a
    // DIRECTORY of nChunks single-file chunks in ts order (file mod
    // times ascending = FileStreamSource admission order), raw
    // physical schema preserved so eventStream's unit peek still works
    val amortDir = SparkEnv.scratchDir("amort-sf")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.expressions.Window
    // order by the raw ts column directly — works for every physical
    // unit the driver has shipped (ns-as-long, µs NTZ)
    val chunked = raw.withColumn("__chunk",
      ntile(nChunks).over(Window.orderBy(col("ts"))))
    for (i <- 1 to nChunks) {
      chunked.filter(col("__chunk") === i).drop("__chunk")
        .coalesce(1).write.mode("append").parquet(s"$amortDir/events.parquet")
      Thread.sleep(1100) // distinct mod-time seconds → stable admission order
    }

    val pipelines: Seq[(String, String => Seq[StreamMetrics.BatchMetrics])] = Seq(
      "q_stream_hourly_counters" -> { d =>
        Serving.runPipelineMetered(spark, d, new InMemoryServingStore,
          SparkEnv.scratchDir("amort-hourly"))._2
      },
      "q_stream_account_daily" -> { d =>
        Serving.runAccountPipelineMetered(spark, d, new InMemoryServingStore,
          SparkEnv.scratchDir("amort-acct"))._2
      },
      "q_stream_time_weighted" -> { d =>
        TimeWeighted.dailyReportMetered(spark, d)._2
      })

    println("| pipeline | batches | b1 ms | marginal ms/batch | marginal µs/row | one-shot ms | one-shot µs/row | marginal/one-shot per-row |")
    println("|---|---|---|---|---|---|---|---|")
    for ((name, run) <- pipelines) {
      // sys-prop form: runners stream on an isolated newSession()
      sys.props("graft.stream.maxFilesPerTrigger") = "1"
      val hist = try run(amortDir)
        finally sys.props.remove("graft.stream.maxFilesPerTrigger")
      val data = hist.filter(_.numInputRows > 0)
      val marginal = data.drop(1) // b1 carries the one-time costs
      val mMs = marginal.map(_.batchDurationMs.toDouble)
      val mRows = marginal.map(_.numInputRows.toDouble).sum
      val marginalMs = if (mMs.nonEmpty) mMs.sum / mMs.size else Double.NaN
      val marginalUsRow = if (mRows > 0) mMs.sum * 1000 / mRows else Double.NaN
      val oneHist = run(amortDir) // fresh checkpoint, all files one batch
      val oneData = oneHist.filter(_.numInputRows > 0)
      val oneMs = oneData.map(_.batchDurationMs.toDouble).sum
      val oneRows = oneData.map(_.numInputRows.toDouble).sum
      val oneUsRow = if (oneRows > 0) oneMs * 1000 / oneRows else Double.NaN
      println(f"| $name | ${data.size} | ${data.headOption.map(_.batchDurationMs).getOrElse(-1L)} | " +
        f"$marginalMs%.0f | $marginalUsRow%.2f | $oneMs%.0f | $oneUsRow%.2f | " +
        f"${marginalUsRow / oneUsRow}%.2f× |")
    }
    spark.stop()
  }
}
