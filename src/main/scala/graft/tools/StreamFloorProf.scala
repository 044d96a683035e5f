package graft.tools

import graft.SparkEnv
import graft.streaming.{InMemoryServingStore, Serving}
import org.apache.spark.sql.functions._

/** Dev tool (round-11, VERDICT r10 task #5): split the ~0.5–0.7 s
  * marginal micro-batch floor StreamAmortProf measured into its
  * phases, straight from StreamingQueryProgress.durationMs —
  * latestOffset (source listing), getBatch, queryPlanning, addBatch
  * (the actual job incl. state commit + sink), walCommit/commitOffsets
  * (checkpoint WAL fsyncs). Knobs via sys-props consumed by the
  * runner: graft.test.stateParts (state-store count),
  * graft.stream.maxFilesPerTrigger=1 (chunked admission).
  *
  *   sbt "runMain graft.tools.StreamFloorProf [nChunks] [stateParts ...]"
  */
object StreamFloorProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nChunks = if (args.nonEmpty) args(0).toInt else 6
    val partChoices = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(8, 4, 2, 1)
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      graft.Bench.warmCpu(spark)
    } catch { case _: Throwable => }

    val amortDir = SparkEnv.scratchDir("floor-sf")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.expressions.Window
    val chunked = raw.withColumn("__chunk",
      ntile(nChunks).over(Window.orderBy(col("ts"))))
    for (i <- 1 to nChunks) {
      chunked.filter(col("__chunk") === i).drop("__chunk")
        .coalesce(1).write.mode("append").parquet(s"$amortDir/events.parquet")
      Thread.sleep(1100)
    }

    val phases = Seq("latestOffset", "getBatch", "queryPlanning",
      "addBatch", "walCommit", "commitOffsets")
    println("| stateParts | batches | marginal ms/batch | " +
      phases.mkString(" ms | ") + " ms | (marginal means, b1 excluded) |")
    println("|---|---|---|" + phases.map(_ => "---|").mkString + "---|")
    for (parts <- partChoices) {
      sys.props("graft.stream.maxFilesPerTrigger") = "1"
      sys.props("graft.test.stateParts") = parts.toString
      val q = try {
        val store = new InMemoryServingStore
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", parts.toString)
        val agg = Serving.hourlyCounters(
          graft.streaming.Ingest.eventStream(s2, amortDir))
        val query = agg.writeStream
          .outputMode("update")
          .option("checkpointLocation", SparkEnv.scratchDir(s"floor-ck-$parts"))
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            store.sinkBatch(Serving.keyedCounters(batch), batchId)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        query
      } finally {
        sys.props.remove("graft.stream.maxFilesPerTrigger")
        sys.props.remove("graft.test.stateParts")
      }
      val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      val marginal = prog.drop(1)
      def avg(k: String): Double = {
        val vs = marginal.flatMap(p => Option(p.durationMs.get(k)).map(_.doubleValue))
        if (vs.isEmpty) Double.NaN else vs.sum / vs.size
      }
      val trig = {
        val vs = marginal.flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.doubleValue))
        if (vs.isEmpty) Double.NaN else vs.sum / vs.size
      }
      println(f"| $parts | ${prog.size} | $trig%.0f | " +
        phases.map(k => f"${avg(k)}%.0f | ").mkString + " |")
    }
    spark.stop()
  }
}
