package graft.tools

import graft.SparkEnv
import org.apache.spark.sql.functions._

/** Dev tool (round 14): decompose q_stream_stream_join_wm's wall time
  * — chunk-dir build, per-micro-batch trigger cost, state metrics,
  * final read-back aggregation — to size the declared gate's chunk
  * count against the measured per-batch floor.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StreamJoinWmProf [nChunks]"
  */
object StreamJoinWmProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val nChunks = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      graft.Bench.warmCpu(spark)
    } catch { case _: Throwable => }

    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val ingestDir = graft.streaming.Ingest
        .timeChunkedEventDir(spark, sfDir, nChunks)
      val t1 = System.nanoTime()
      val s2 = SparkEnv.stateSession(spark)
      def side(tpe: String, u: String, t: String) =
        s2.readStream.schema(graft.streaming.Ingest.chunkedEventSchema)
          .option("maxFilesPerTrigger", "1").parquet(ingestDir)
          .filter(col("event_type") === tpe)
          .select(col("user_id").as(u), col("ts").as(t))
      val joined = side("purchase", "p_user", "p_ts").withWatermark("p_ts", "2 hours")
        .join(side("click", "c_user", "c_ts").withWatermark("c_ts", "2 hours"),
          col("p_user") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"))
      val qname = s"ssjoin_wm_prof_$pass"
      val q = joined.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", SparkEnv.scratchDir("ssjoinwm-prof-ckpt"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val t2 = System.nanoTime()
      val res = s2.table(qname)
        .groupBy(date_trunc("day", col("p_ts")).as("day"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("p_user")).as("n_users"))
        .orderBy("day")
      val n = res.queryExecution.toRdd.count()
      val t3 = System.nanoTime()
      println(f"pass $pass: build=${(t1 - t0) / 1e9}%.2f s stream=${(t2 - t1) / 1e9}%.2f s readback=${(t3 - t2) / 1e9}%.2f s rows=$n")
      for (b <- graft.streaming.StreamMetrics.history(q)) {
        val st = b.stateOperators.map(s =>
          s"${s.numRowsTotal}t/${s.numRowsUpdated}u/${s.numRowsRemoved}r").mkString(",")
        println(f"  batch ${b.batchId}%2d in=${b.numInputRows}%6d dur=${b.batchDurationMs}%5d ms state=[$st]")
      }
    }
    spark.stop()
  }
}
