package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CONTINUOUS join-view maintenance (round 15, VERDICT r14 #2): the
  * reference's deltas-applied-at-ingest architecture applied to the
  * round-14 join-view operator. `q_incremental_join_view`
  * ([[graft.queries.Maintenance]]) applies ONE delta batch; this
  * pipeline maintains the same view
  *   V = SELECT seg, day, count(*), sum(value)
  *       FROM events ⋈ customer
  * continuously, under BOTH delta kinds, each on its natural cadence:
  *
  *  - **ΔA (fact inserts, every micro-batch):** events stream in
  *    time-ordered chunks; each micro-batch joins the (broadcast)
  *    dimension snapshot and folds into an update-mode streaming
  *    aggregation keyed (seg, day) — Spark's state store IS the
  *    incremental merge (n += Δn, sv += Δsv on abelian-group
  *    aggregates), so per-batch cost ∝ batch size and is flat in
  *    stream length (only touched keys re-emit; state = |view grid|,
  *    never corpus history). Each updated key HSETs its running total
  *    into the [[ServingStore]] — the replay-idempotent upsert
  *    contract every pipeline here uses.
  *  - **ΔB (dimension churn, slow cadence):** a changed dimension key
  *    moves its ENTIRE fact history between groups — a state-keyed
  *    aggregation cannot express that (the grouping key itself
  *    changed), so this leg applies the signed delta rule
  *    A_full ⋈ ΔB with multiplicities ±1 DIRECTLY against the store:
  *    read the touched keys' stored totals, add the signed partials
  *    (exact decimal arithmetic), write back one maintenance batch. A
  *    group retracted to n = 0 writes an n=0 TOMBSTONE (latest-batch-
  *    wins makes it authoritative; readers filter n > 0). Cost ∝
  *    |facts ⋈ ΔB| + |touched view keys| — the known price of
  *    dimension churn in any IVM scheme, and why deployments batch
  *    dimension updates.
  *
  * The declared gate `q_stream_join_view` runs both legs end-to-end
  * and is gated by the SAME full-recompute oracle as the batch twin —
  * continuous-incremental ≡ batch, checked by hash. JoinViewSpec
  * additionally drives 10 chunks at sf0.001 and asserts the scale
  * claims from the run's own progress metrics (state rows = grid-
  * sized, flat across batches) plus restart/replay exactly-once.
  */
object JoinView {

  /** `<seg>/day/<yyyy-MM-dd>` — the store key scheme (segment plays
    * the reference's account role).
    */
  private def keyCol = concat_ws("/", col("seg"), lit("day"),
    date_format(col("day"), "yyyy-MM-dd")).as("key")

  /** The ΔA leg: chunked event stream ⋈ broadcast dim → update-mode
    * (seg, day) totals → HSET each updated key. Joins the OLD
    * dimension snapshot (churn is applied separately, on its own
    * cadence, by [[applyDimChurn]]). Returns the completed query's
    * per-batch metrics alongside the store.
    */
  def runPipeline(spark: SparkSession, sfDir: String, store: ServingStore,
      checkpoint: String, nChunks: Int = 3)
      : (ServingStore, Seq[StreamMetrics.BatchMetrics]) = {
    val q = startPipeline(spark, sfDir, store, checkpoint, nChunks)
    q.awaitTermination()
    (store, StreamMetrics.history(q))
  }

  /** [[runPipeline]] without the terminal await — the handle the
    * crash-recovery spec needs (stop mid-stream, restart over the
    * same checkpoint + store, assert exactly-once convergence).
    *
    * `compactEvery` > 0 wires the serving-store compaction as an
    * IN-STREAM maintenance cadence: every N-th micro-batch, after its
    * own write commits, the accumulated deltas fold into the
    * versioned base with `retainBatches = 1` — the just-committed
    * batch (recovery's only replay candidate) stays an un-folded
    * delta, though the versioned-base design no longer depends on
    * that for replay safety. Safe inside foreachBatch because the
    * hook runs serialized with the stream's own writes (the store's
    * single-writer discipline holds by construction); the store's
    * dir count — and with it every read's merge width — is then
    * BOUNDED by the cadence instead of growing with stream length.
    */
  def startPipeline(spark: SparkSession, sfDir: String, store: ServingStore,
      checkpoint: String, nChunks: Int = 3, compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val s2 = graft.SparkEnv.stateSession(spark)
    val ingestDir = graft.streaming.Ingest
      .timeChunkedFullEventDir(spark, sfDir, nChunks)
    val dim = graft.queries.Maintenance.churnedDim(s2, sfDir)
      .select(col("c_custkey"), col("old_seg"))
    val ev = s2.readStream.schema(Ingest.chunkedFullEventSchema)
      .option("maxFilesPerTrigger", "1") // one time-ordered chunk per batch
      .parquet(ingestDir)
    val agg = ev
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("old_seg").as("seg"),
        date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.sinkBatch(
          batch.select(keyCol, col("n_events"), col("sum_value")), batchId)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          store match {
            case p: ParquetServingStore => p.compact(retainBatches = 1)
            case _ => ()
          }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** The ΔB leg (see class doc): apply the dimension churn's signed
    * deltas against the maintained store. `batchId` must exceed every
    * stream batch id (latest-batch-wins resolves the maintenance
    * write as authoritative); the default sits at 2⁶² — the
    * MAINTENANCE id space, unreachable by a stream incrementing one
    * id per micro-batch (round-15 review: the earlier 10⁶ sentinel
    * was ~11 days of 1 s triggers away from a collision).
    *
    * Decimal discipline: stored sum_value doubles are exact casts of
    * 2-decimal totals, so casting BACK to decimal(24,2) recovers the
    * exact stored decimal; the signed partials add in decimal and
    * cast to double once on emission — the same order-independent
    * exactness contract every counter pipeline here follows.
    */
  def applyDimChurn(spark: SparkSession, sfDir: String,
      store: ParquetServingStore,
      batchId: Long = ParquetServingStore.MaintenanceIdBase): ServingStore = {
    val changed = graft.queries.Maintenance.churnedDim(spark, sfDir)
      .filter(col("old_seg") =!= col("new_seg"))
    // A_full ⋈ ΔB: changed keys' whole history, one fact scan against
    // the broadcast changed-key set, pre-aggregated to the view grain
    val hist = graft.Tables.events(spark, sfDir)
      .join(broadcast(changed), col("user_id") === col("c_custkey"))
      .groupBy(col("old_seg"), col("new_seg"),
        date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(24,2)").as("sv"))
    val dV = hist
      .select(col("new_seg").as("seg"), col("day"), col("n"), col("sv"))
      .unionAll(hist.select(col("old_seg").as("seg"), col("day"),
        (-col("n")).as("n"), (-col("sv")).cast("decimal(24,2)").as("sv")))
      .groupBy("seg", "day")
      .agg(sum("n").as("dn"), sum("sv").cast("decimal(24,2)").as("dsv"))
      .select(keyCol, col("dn"), col("dsv"))
    // merge ONLY the touched keys with their stored totals (left join:
    // a group the churn creates from nothing starts at 0); untouched
    // keys are never rewritten — their older batch rows stay
    // authoritative under latest-batch-wins. Read the PRE-maintenance
    // snapshot (batches strictly below this batch's id — round-15
    // review): a read-modify-write that read latest() would see its
    // own committed output on a post-crash re-run and double-apply
    // the delta; latestBefore makes the write a pure function of the
    // pre-churn state, so replays recompute byte-identical output and
    // the per-batchId idempotence contract holds.
    val stored = store.latestBefore(batchId)
      .select(col("key"), col("nEvents"),
        col("sumValue").cast("decimal(24,2)").as("sv_old"))
    val mergedRows = dV.join(stored, Seq("key"), "left")
      .select(col("key"),
        (coalesce(col("nEvents"), lit(0L)) + col("dn")).as("n_events"),
        (coalesce(col("sv_old"), lit(0).cast("decimal(24,2)")) + col("dsv"))
          .cast("double").as("sum_value"))
    // n = 0 rows stay in as tombstones — the key's latest value marks
    // it deleted; readers filter n_events > 0 (and compaction drops
    // tombstones entirely once they are the latest)
    store.sinkBatch(mergedRows, batchId)
    store
  }

  /** `q_stream_join_view`'s body: both legs end-to-end, then the
    * store's resolved view (tombstones filtered).
    */
  def maintainedView(spark: SparkSession, sfDir: String,
      nChunks: Int = 3): DataFrame = {
    val store = new ParquetServingStore(
      spark, graft.SparkEnv.scratchDir("graft-joinview-store"))
    runPipeline(spark, sfDir, store,
      graft.SparkEnv.scratchDir("graft-joinview-ckpt"), nChunks)
    applyDimChurn(spark, sfDir, store)
    store.latest()
      .filter(col("nEvents") > 0)
      .select(col("key"), col("nEvents").as("n_events"),
        col("sumValue").as("sum_value"))
      .orderBy("key")
  }
}
