package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous ANN serving (round-5 verdict stretch #7): a stream of
  * query vectors probes the PERSISTED IVF-PQ artifacts — closing the
  * loop between the build-once search artifacts
  * ([[Similarity.cachedIvfIndex]] / [[Similarity.cachedIvfPqCodes]])
  * and the streaming surface.
  *
  * Shape: the artifacts are static (built offline, reloaded from
  * cell-partitioned parquet); each arriving micro-batch of queries is
  * answered by the SAME batch prober ([[Similarity.ivfPqTopK]]) via
  * `foreachBatch` — one code path for batch and serving, so the two
  * cannot drift (AnnServingSpec asserts stream results equal the
  * batch probe on identical queries). Per-query ranking needs a
  * window over the candidate set, which streaming append mode cannot
  * express directly; per-micro-batch batch semantics is exactly the
  * serving contract (each query batch is answered completely,
  * independently).
  *
  * Scale shape: queries broadcast (a serving batch is small), the
  * code relation is the 32×-compressed cell-partitioned table probed
  * at nProbe/nCells of its cells, raw vectors are touched only for
  * the bounded re-rank — identical cost profile to the batch probe,
  * amortized across the stream.
  */
object AnnServing {

  /** Start serving: every micro-batch of `queryStream` (`vec_id:
    * LONG, embedding: ARRAY<FLOAT>`) is probed against the artifacts
    * and handed to `sink` as a complete per-batch result frame
    * (q_id, vec_id, cos_sim, rn).
    */
  def serve(queryStream: DataFrame,
      index: Similarity.IvfIndex,
      model: graft.functions.PqModel,
      coded: DataFrame,
      checkpointDir: String,
      k: Int = 3, nProbe: Int = 2, rerank: Int = 32,
      availableNow: Boolean = false)
      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = queryStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val res = Similarity.ivfPqTopK(index, model, batch, k, nProbe,
          rerank, codedRel = Some(coded))
        sink(res, batchId)
        ()
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}
