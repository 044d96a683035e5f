package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming MinHash-LSH near-duplicate detection (SURVEY.md §2
  * K2 × I6): every incoming document is checked against ALL
  * previously-seen documents, continuously — the online form of the
  * batch [[graft.operators.Dedup.minhashCandidates]] pipeline, and
  * the shape a crawl-ingest dedup gate takes at 100 TB.
  *
  * Plan: the codegen'd `minhash_sig` expression makes the signature a
  * stateless per-row projection (streaming-safe — no aggregation
  * before the stateful op), bands explode ×b, and the only stateful
  * node is `transformWithState` keyed by (band, band_sig): typed
  * `ListState` holds the bucket's member doc ids; each new arrival
  * emits one candidate pair per prior member and appends itself.
  *
  * State is the LSH BUCKET INDEX — O(corpus × b) doc ids, not texts
  * or signatures — sharded across executors by bucket key, exactly
  * how a distributed online dedup index partitions. A pair sharing
  * multiple bands is emitted once per shared band (downstream
  * dedup/verify is batch's `.distinct()` + exact-Jaccard check — at
  * ingest time the candidates feed a verify-then-reject step keyed by
  * the candidate pair, so per-band duplicates cost one lookup each).
  *
  * A single-batch (or any-split) run emits exactly the batch
  * pipeline's candidate pairs, orientation aside — StreamDedupSpec
  * asserts set equality against `minhashCandidates` on the fixtures.
  * Replay-safe: a doc id already in its bucket's member list is not
  * re-added and emits no new pairs.
  */
object StreamDedup {

  /** One (bucket, member) arrival. */
  case class BandRow(band: Int, band_sig: Long, doc_id: Long)

  /** Candidate pair: `id_a` was seen first (or is the smaller id
    * within one micro-batch), `id_b` is the new arrival.
    */
  case class CandPair(id_a: Long, id_b: Long)

  /** The LSH bucket index, generic over the bucket KEY type (xxhash64
    * `band_sig: Long` vs portable raw-tuple `band_key: String`) and
    * the arriving row type — round-13 review: the two monomorphic
    * twins were verbatim copies, so any fix to the index logic had to
    * land twice. Emits one [[CandPair]] per (prior member, new
    * arrival); replayed docs (already members) add nothing.
    */
  class BucketIndexProcessor[K, R](docId: R => Long)
      extends StatefulProcessor[K, R, CandPair] {
    @transient private var members: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("members",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[R],
        timerValues: TimerValues): Iterator[CandPair] = {
      val existing = members.get().toVector
      val seen = existing.toSet
      // ascending id order within the batch keeps output orientation
      // deterministic regardless of partition iteration order
      val fresh = rows.map(docId).toVector.distinct.sorted
        .filterNot(seen) // replayed docs add nothing
      if (fresh.isEmpty) return Iterator.empty
      val out = Vector.newBuilder[CandPair]
      var prior = existing
      fresh.foreach { d =>
        prior.foreach(p => out += CandPair(p, d))
        prior :+= d
      }
      members.appendList(fresh.toArray)
      out.result().iterator
    }
  }

  /** Wire a streaming `(doc_id, text)` relation into the continuous
    * candidate stream. `docs` must be a streaming DataFrame with
    * `doc_id: LONG` and `text: STRING`.
    */
  def candidates(docs: DataFrame, k: Int = 32, bands: Int = 8): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      // NULL texts band to the constant xxhash64 seed: without this
      // filter they all share one bucket whose keyed ListState grows
      // forever, emitting a pair per prior member on each arrival
      // (mirrors Dedup.minhashCandidates / Dedup.simhash).
      .filter(col("text").isNotNull)
      .select(col("doc_id"), expr(s"minhash_sig(text, 3, $k)").as("sig"))
      .select(col("doc_id"), explode(array(Dedup.bandStructs(k, bands): _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.band_sig").as("band_sig"),
        col("doc_id"))
      .as[BandRow]
      .groupByKey(b => (b.band, b.band_sig))
      .transformWithState(new BucketIndexProcessor[(Int, Long), BandRow](_.doc_id),
        TimeMode.None(), OutputMode.Append())
  }

  /** One (bucket, member) arrival in the PORTABLE family: the band
    * key is the raw minhash r-tuple rendered as a string — exactly
    * the raw-tuple bucket join the `q_minhash_near_dups` oracle
    * replays, no band-hash between the signature and the bucket (a
    * hash there could, in principle, bucket pairs the oracle's
    * raw-tuple equality never sees).
    */
  case class PortableBandRow(band: Int, band_key: String, doc_id: Long)

  /** [[candidates]] in the oracle-portable md5 family (round 11):
    * `minhash_sig_md5` signatures, raw-tuple band keys — the stream
    * emits, batch split aside, exactly
    * [[graft.operators.Dedup.minhashCandidatesPortable]]'s pair set
    * (StreamDedupSpec asserts it), which is what lets
    * `q_stream_near_dups` share the batch query's full value gate.
    */
  def candidatesPortable(docs: DataFrame, k: Int = 16,
      bands: Int = 4): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bandCols = Dedup.portableBandStructs(k, bands)
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), expr(s"minhash_sig_md5(text, 3, $k)").as("sig"))
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.band_key").as("band_key"),
        col("doc_id"))
      .as[PortableBandRow]
      .groupByKey(b => (b.band, b.band_key))
      .transformWithState(
        new BucketIndexProcessor[(Int, String), PortableBandRow](_.doc_id),
        TimeMode.None(), OutputMode.Append())
  }
}
