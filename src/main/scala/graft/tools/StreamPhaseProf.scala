package graft.tools

import java.util.UUID
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Static event sink the per-session [[StreamPhaseListener]] instances
  * feed (the `spark.sql.streaming.streamingQueryListeners` static conf
  * instantiates one listener per SessionState, so the DECLARED queries'
  * cloned state sessions are covered without touching their code).
  */
object StreamPhaseEvents {
  final case class Run(name: String, runId: UUID, startedWallMs: Long)
  final case class Prog(runId: UUID, batchId: Long, triggerStartMs: Long,
      numInputRows: Long, durationMs: Map[String, Long],
      stateCommitMs: Long, stateUpdateMs: Long, rowsUpdated: Long,
      rowsTotal: Long, custom: Map[String, Long])

  val runs = new TrieMap[UUID, Run]()
  val progs = new java.util.concurrent.ConcurrentLinkedQueue[Prog]()
  val terminated = new TrieMap[UUID, Long]()

  def clear(): Unit = { runs.clear(); progs.clear(); terminated.clear() }
}

/** Listener registered through the static conf — records every stream
  * run's start/terminate wall time and each batch's phase breakdown
  * (`durationMs`: latestOffset, getBatch, queryPlanning, walCommit,
  * commitOffsets, addBatch, triggerExecution) plus state-operator
  * commit/update times and RocksDB custom metrics.
  */
class StreamPhaseListener extends StreamingQueryListener {
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    StreamPhaseEvents.runs.put(e.runId, StreamPhaseEvents.Run(
      Option(e.name).getOrElse("<unnamed>"), e.runId, System.currentTimeMillis()))

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val so = p.stateOperators.toSeq
    StreamPhaseEvents.progs.add(StreamPhaseEvents.Prog(
      p.runId, p.batchId,
      java.time.Instant.parse(p.timestamp).toEpochMilli,
      p.numInputRows,
      p.durationMs.asScala.map { case (k, v) => k -> v.longValue }.toMap,
      so.map(_.commitTimeMs).sum,
      so.map(_.allUpdatesTimeMs).sum,
      so.map(_.numRowsUpdated).sum,
      so.map(_.numRowsTotal).sum,
      so.flatMap(_.customMetrics.asScala.map { case (k, v) => k -> v.longValue })
        .filter(_._2 != 0).toMap))
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    StreamPhaseEvents.terminated.put(e.runId, System.currentTimeMillis())
}

/** Dev-only per-stream phase census (round-16, VERDICT r15 #2): run a
  * set of DECLARED streaming queries end-to-end (the full query body —
  * chunk-dir builds, artifact legs, batch verifies, final reads
  * included, exactly what Bench times) and decompose each contained
  * stream run into
  *
  *   start gap (query start → first trigger: source listing, WAL init,
  *   AvailableNow offset capture) · per-batch trigger phases
  *   (latestOffset / getBatch / queryPlanning / walCommit /
  *   commitOffsets / addBatch, plus state commit+update and RocksDB
  *   custom metrics) · stop gap (last trigger end → terminate) ·
  *   non-stream share (declared wall − Σ stream spans: batch legs,
  *   final result read).
  *
  *   sbt "runMain graft.tools.StreamPhaseProf [q_a q_b ...]"
  */
object StreamPhaseProf {
  private val DefaultTargets = Seq(
    "q_stream_stream_join_wm", "q_stream_join_view", "q_stream_account_daily",
    "q_stream_near_dups", "q_stream_psi_drift")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val spark = graft.SparkEnv.builder()
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.tools.StreamPhaseListener")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    graft.Bench.warmCpu(spark)
    val names = if (args.nonEmpty) args.toSeq else DefaultTargets
    // micro-section: stream CONSTRUCTION cost (footer peek + relation
    // resolution) — the per-stream fixed cost the round-16 eventStream
    // memo targets; first call pays the peek, the rest show the hit
    for (i <- 1 to 4) {
      val s2 = graft.SparkEnv.stateSession(spark)
      val t0 = System.nanoTime()
      graft.streaming.Ingest.eventStream(s2, sfDir)
      println(f"eventStream construction #$i: ${(System.nanoTime() - t0) / 1e6}%.1f ms")
    }
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      spark.catalog.clearCache()
      fn(spark, sfDir).queryExecution.toRdd.count() // warm (builds memoized artifacts)
      for (p <- 1 to passes) {
        spark.catalog.clearCache()
        StreamPhaseEvents.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async — drain before reading the buffers
        org.apache.spark.GraftScratchBridge.waitListenerBusEmpty(spark.sparkContext)
        val runs = StreamPhaseEvents.runs.values.toSeq.sortBy(_.startedWallMs)
        val progs = StreamPhaseEvents.progs.asScala.toSeq
        var streamSpanMs = 0L
        println(f"\n== $name pass $p wall=$wall%.3f s (${runs.size} stream run(s))")
        for (r <- runs) {
          val ps = progs.filter(_.runId == r.runId).sortBy(_.batchId)
          val endMs = StreamPhaseEvents.terminated.getOrElse(r.runId,
            ps.lastOption.map(q => q.triggerStartMs +
              q.durationMs.getOrElse("triggerExecution", 0L)).getOrElse(r.startedWallMs))
          val span = endMs - r.startedWallMs
          streamSpanMs += span
          val startGap = ps.headOption.map(_.triggerStartMs - r.startedWallMs)
          val stopGap = ps.lastOption.map(q => endMs - (q.triggerStartMs +
            q.durationMs.getOrElse("triggerExecution", 0L)))
          println(f"  run ${r.name} span=${span}ms startGap=${startGap.getOrElse(-1L)}ms " +
            f"stopGap=${stopGap.getOrElse(-1L)}ms batches=${ps.size}")
          for (q <- ps) {
            val d = q.durationMs
            def g(k: String) = d.getOrElse(k, 0L)
            println(f"    batch ${q.batchId} rows=${q.numInputRows}%-6d " +
              f"trig=${g("triggerExecution")}%5d addBatch=${g("addBatch")}%5d " +
              f"plan=${g("queryPlanning")}%4d latestOff=${g("latestOffset")}%4d " +
              f"getBatch=${g("getBatch")}%3d wal=${g("walCommit")}%4d " +
              f"commitOff=${g("commitOffsets")}%4d stCommit=${q.stateCommitMs}%4d " +
              f"stUpd=${q.stateUpdateMs}%4d rowsUpd=${q.rowsUpdated} rowsTot=${q.rowsTotal}")
            if (q.custom.nonEmpty)
              println("      custom: " + q.custom.toSeq.sortBy(-_._2).take(12)
                .map { case (k, v) => s"$k=$v" }.mkString(" "))
          }
        }
        println(f"  stream spans total=${streamSpanMs / 1e3}%.3f s · " +
          f"non-stream (batch legs, final read, gaps between runs)=" +
          f"${wall - streamSpanMs / 1e3}%.3f s")
      }
    }
    spark.stop()
  }
}
