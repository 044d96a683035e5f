package graft

import org.apache.spark.sql.functions._

/** Pins the round-12 review-fix claim on the new streaming gates: the
  * DECLARED q_stream_dedup_users and q_stream_stream_join results are
  * invariant to ingestion batching. The fixture ships as one parquet
  * file, so the driver's gate only ever sees a single AvailableNow
  * micro-batch; this spec rebuilds the events table as a CHUNKED
  * directory (4 files), forces one-file-per-trigger via the
  * `graft.stream.maxFilesPerTrigger` sys-prop (the exact leak path the
  * review flagged — isolated newSession() streams read it), and
  * asserts the multi-batch declared results still equal the batch
  * truth: dedup state carries across batches, and the 35-day
  * watermark admits every cross-batch purchase–click pair.
  */
class StreamBatchingInvarianceSpec extends SparkSpec {

  private lazy val chunkedDir: String = {
    val dir = SparkEnv.scratchDir("chunked-sf")
    spark.read.parquet(s"$sf/events.parquet").repartition(4)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def withChunkedTriggers[T](body: => T): T = {
    sys.props("graft.stream.maxFilesPerTrigger") = "1"
    try body finally sys.props -= "graft.stream.maxFilesPerTrigger"
  }

  test("q_stream_dedup_users is batching-invariant: 4 one-file " +
      "micro-batches == the batch COUNT(DISTINCT)") {
    val got = withChunkedTriggers {
      SparkEntry.queries("q_stream_dedup_users")(spark, chunkedDir).collect()
    }
    val want = Tables.events(spark, chunkedDir)
      .filter(col("user_id").isNotNull)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type", "day").collect()
    assert(got.toSeq == want.toSeq,
      s"multi-batch dedup diverged: ${got.length} vs ${want.length} rows")
  }

  test("q_stream_stream_join is batching-invariant: the 35-day watermark " +
      "admits every cross-batch pair") {
    val got = withChunkedTriggers {
      SparkEntry.queries("q_stream_stream_join")(spark, chunkedDir).collect()
    }
    val ev = Tables.events(spark, chunkedDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val want = p.join(c, col("pu") === col("cu") &&
        col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("cts") <= col("pts"))
      .groupBy(date_trunc("day", col("pts")).as("day"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("pu")).as("n_users"))
      .orderBy("day").collect()
    assert(got.toSeq == want.toSeq,
      s"multi-batch interval join diverged: ${got.length} vs ${want.length} rows")
  }
}
