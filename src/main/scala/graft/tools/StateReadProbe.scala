package graft.tools

import graft.SparkEnv
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev probe (round 12): discover the exact relation Spark's
  * `statestore` batch source surfaces for a streaming-aggregation
  * checkpoint — key/value struct field names and types, operator and
  * partition columns — before wiring the q_state_reader declared
  * query. Run:
  *
  *   sbt "runMain graft.tools.StateReadProbe /root/testdata/sf0.001"
  */
object StateReadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckpt = SparkEnv.scratchDir("graft-state-probe-ckpt")

    val agg = graft.streaming.Ingest.eventStream(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))

    val q = agg.writeStream
      .outputMode("update")
      .format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val st = spark.read.format("statestore").load(ckpt)
    st.printSchema()
    st.show(5, truncate = false)
    println("rows=" + st.count())
    spark.stop()
  }
}
