package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryProgress}

/** The observability surface a continuous-pipeline operator actually
  * watches (SURVEY.md §2 I-family): throughput (rows/s in and
  * processed), state size (rows + bytes per stateful operator), and
  * watermark lag (how far event-time processing trails the newest
  * data). Structured Streaming already measures all of it per
  * micro-batch in [[StreamingQueryProgress]]; this module lifts the
  * raw progress JSON into typed rows so runners can return metrics
  * alongside results and dashboards/specs can assert on them without
  * string-parsing.
  *
  * At 100 TB these are the three alarms that matter: falling
  * processedRowsPerSecond (backpressure), growing stateRowsTotal
  * (eviction/watermark misconfiguration — unbounded state is the #1
  * streaming outage), and growing watermarkLagMs (late-data surge or
  * a stalled partition).
  */
object StreamMetrics {

  final case class StateOpMetrics(
      operatorName: String,
      numRowsTotal: Long,
      numRowsUpdated: Long,
      numRowsRemoved: Long,
      memoryUsedBytes: Long)

  final case class BatchMetrics(
      batchId: Long,
      numInputRows: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      batchDurationMs: Long,
      watermark: Option[java.time.Instant],
      maxEventTime: Option[java.time.Instant],
      watermarkLagMs: Option[Long],
      stateOperators: Seq[StateOpMetrics]) {
    def stateRowsTotal: Long = stateOperators.map(_.numRowsTotal).sum
  }

  private def parseTime(s: String): Option[java.time.Instant] =
    // eventTime entries are ISO-8601 UTC; a batch with no event-time
    // column (or watermark 1970 epoch before any data) parses but is
    // kept — interpretation is the caller's. Catch ONLY the parse
    // failure (round-15 review): a Throwable net here swallowed fatal
    // VM errors and interrupts into a silent watermark=None
    try Option(s).map(java.time.Instant.parse)
    catch { case _: java.time.format.DateTimeParseException => None }

  def summarize(p: StreamingQueryProgress): BatchMetrics = {
    val et = p.eventTime
    val wm = Option(et.get("watermark")).flatMap(parseTime)
    val mx = Option(et.get("max")).flatMap(parseTime)
    val lag = for (w <- wm; m <- mx) yield m.toEpochMilli - w.toEpochMilli
    BatchMetrics(
      batchId = p.batchId,
      numInputRows = p.numInputRows,
      inputRowsPerSecond =
        if (p.inputRowsPerSecond.isNaN) 0.0 else p.inputRowsPerSecond,
      processedRowsPerSecond =
        if (p.processedRowsPerSecond.isNaN) 0.0 else p.processedRowsPerSecond,
      batchDurationMs = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L),
      watermark = wm,
      maxEventTime = mx,
      watermarkLagMs = lag,
      stateOperators = p.stateOperators.toSeq.map(so => StateOpMetrics(
        so.operatorName, so.numRowsTotal, so.numRowsUpdated,
        so.numRowsRemoved, so.memoryUsedBytes)))
  }

  /** Per-batch metrics of everything the query's driver still retains
    * (`spark.sql.streaming.numRecentProgressUpdates`, default 100
    * batches) — call after `awaitTermination`/`processAllAvailable`,
    * or periodically on a live query.
    */
  def history(q: StreamingQuery): Seq[BatchMetrics] =
    q.recentProgress.toSeq.map(summarize)

  def latest(q: StreamingQuery): Option[BatchMetrics] =
    Option(q.lastProgress).map(summarize)
}
