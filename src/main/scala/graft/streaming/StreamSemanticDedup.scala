package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming semantic (embedding) deduplication — the online form of
  * [[graft.operators.Similarity.lshSemanticDedup]] (SURVEY.md §2
  * K2/K3 × I6): every incoming vector is bucketed by the SAME seeded
  * sign-bit hyperplanes as the batch op (a stateless codegen'd
  * projection — streaming-safe), then checked against its bucket's
  * CANONICAL members only; a cosine ≥ tau hit makes it a duplicate of
  * the earliest kept match, otherwise it joins the canonical set.
  *
  * State is the canonical index itself — one (vec_id, embedding) per
  * KEPT vector, sharded across executors by bucket key. Duplicates
  * never enter state, so state size tracks the deduped corpus, not
  * the raw stream: the τ-separated net a 100 TB ingest gate actually
  * serves lookups from. Single-probe buckets are disjoint, so each
  * vector visits exactly one shard (no band fan-out like MinHash).
  *
  * Semantics vs batch: within a micro-batch arrivals are processed in
  * ascending vec_id order, so whenever duplicate families are cliques
  * (every member within tau of every other — planted twins, true
  * copies), the kept set equals the batch connected-components kept
  * set exactly (StreamSemanticDedupSpec pins this). On CHAINS
  * (a~b, b~c, a̸~c) greedy keeps a maximal τ-separated subset {a, c}
  * where batch transitive closure keeps only {a} — the online gate
  * guarantees no two KEPT vectors are near-duplicates, which is the
  * user-facing invariant both forms share. Replay-safe: an id already
  * canonical is skipped; a replayed duplicate re-emits its identical
  * verdict (idempotent content for an at-least-once sink).
  */
object StreamSemanticDedup {

  /** One bucketed arrival. */
  case class VecRow(bucket: Long, vec_id: Long, embedding: Array[Float])

  /** A canonical (kept) vector in bucket state. */
  case class Kept(vec_id: Long, emb: Array[Float])

  /** Per-vector decision: `dup_of` = earliest canonical match, or -1
    * when the vector is kept as canonical itself.
    */
  case class Verdict(vec_id: Long, is_dup: Boolean, dup_of: Long)

  /** Same IEEE-sequential double dot as the batch `vec_dot` (cast each
    * float to double, multiply, left-fold) so stream and batch agree
    * on every threshold decision bit-for-bit.
    */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0; var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  class Processor(tau: Double) extends StatefulProcessor[Long, VecRow, Verdict] {
    @transient private var kept: ListState[Kept] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      kept = getHandle.getListState[Kept]("kept", Encoders.product[Kept],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[VecRow],
        timerValues: TimerValues): Iterator[Verdict] = {
      val existing = kept.get().toVector
      val canonicalIds = existing.map(_.vec_id).toSet
      // ascending id order: deterministic regardless of partition
      // iteration order, and min-id-first matches the batch op's
      // canonical choice on clique families
      val fresh = rows.toVector.groupBy(_.vec_id).map(_._2.head).toVector
        .sortBy(_.vec_id)
        .filterNot(v => canonicalIds(v.vec_id)) // replayed canonicals add nothing
      if (fresh.isEmpty) return Iterator.empty
      val out = Vector.newBuilder[Verdict]
      var canon = existing
      val added = Vector.newBuilder[Kept]
      fresh.foreach { v =>
        canon.find(k => dot(k.emb, v.embedding) >= tau) match {
          case Some(k) => out += Verdict(v.vec_id, is_dup = true, dup_of = k.vec_id)
          case None =>
            out += Verdict(v.vec_id, is_dup = false, dup_of = -1L)
            val kk = Kept(v.vec_id, v.embedding)
            canon :+= kk
            added += kk
        }
      }
      val toAdd = added.result()
      if (toAdd.nonEmpty) kept.appendList(toAdd.toArray)
      out.result().iterator
    }
  }

  /** Wire a streaming `(vec_id, embedding)` relation into the verdict
    * stream. NULL embeddings are dropped (they cannot be bucketed and
    * a 100 TB crawl will contain them).
    */
  def verdicts(vecs: DataFrame, tau: Double = 0.4,
      nPlanes: Int = 4): Dataset[Verdict] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.filter(col("embedding").isNotNull)
      .select(
        Similarity.bucketCol("embedding", Similarity.hyperplanes(nPlanes))
          .as("bucket"),
        col("vec_id"), col("embedding"))
      .as[VecRow]
      .groupByKey(_.bucket)
      .transformWithState(new Processor(tau), TimeMode.None(), OutputMode.Append())
  }
}
