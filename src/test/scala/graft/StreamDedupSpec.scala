package graft

import graft.operators.Dedup
import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming MinHash-LSH dedup: the continuous candidate stream over
  * micro-batches equals the batch LSH pipeline's candidate set on the
  * same corpus, and replayed docs emit nothing new.
  */
object StreamDedupSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamDedupSpec extends SparkSpec {
  import StreamDedupSpec.Doc

  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("streamed candidates across micro-batches equal the batch LSH candidate set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val rows = docs.select(col("doc_id"), col("text")).as[Doc].collect()

    val expected = Dedup.minhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture should plant near-dup candidates")

    withRocksDb {
      val mem = MemoryStream[Doc]
      val q = StreamDedup.candidates(mem.toDF())
        .writeStream.format("memory").queryName("stream_dedup_t")
        .outputMode("append")
        .option("checkpointLocation", SparkEnv.scratchDir("stream-dedup"))
        .start()
      // three micro-batches; the last replays batch 2 entirely —
      // replays must emit no new candidates
      val (b1, rest) = rows.partition(_.doc_id % 3 == 0)
      mem.addData(b1.toSeq)
      q.processAllAvailable()
      mem.addData(rest.toSeq)
      q.processAllAvailable()
      mem.addData(rest.toSeq) // replay
      q.processAllAvailable()
      q.stop()
      val got = spark.table("stream_dedup_t").as[StreamDedup.CandPair].collect()
        .map(p => (math.min(p.id_a, p.id_b), math.max(p.id_a, p.id_b))).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("portable streamed candidates across micro-batches equal the batch portable set") {
    // the md5/raw-tuple path under the round-11 q_stream_near_dups
    // value gate: split arrival must emit exactly
    // minhashCandidatesPortable's pair set, replay must add nothing
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val rows = docs.select(col("doc_id"), col("text")).as[Doc].collect()
    val expected = Dedup.minhashCandidatesPortable(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    withRocksDb {
      val mem = MemoryStream[Doc]
      val q = StreamDedup.candidatesPortable(mem.toDF())
        .writeStream.format("memory").queryName("stream_dedup_pt")
        .outputMode("append")
        .option("checkpointLocation", SparkEnv.scratchDir("stream-dedup-pt"))
        .start()
      val (b1, rest) = rows.partition(_.doc_id % 3 == 0)
      mem.addData(b1.toSeq)
      q.processAllAvailable()
      mem.addData(rest.toSeq)
      q.processAllAvailable()
      mem.addData(rest.toSeq) // replay
      q.processAllAvailable()
      q.stop()
      val got = spark.table("stream_dedup_pt").as[StreamDedup.CandPair].collect()
        .map(p => (math.min(p.id_a, p.id_b), math.max(p.id_a, p.id_b))).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("restart from checkpoint: bucket state survives, candidates stay exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val rows = docs.select(col("doc_id"), col("text")).as[Doc].collect()
    val expected = Dedup.minhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    withRocksDb {
      val ckpt = SparkEnv.scratchDir("stream-dedup-restart")
      val (b1, b2) = rows.partition(_.doc_id % 2 == 0)
      // foreachBatch sink: the memory sink rejects checkpoint
      // recovery ("does not support recovering"), foreachBatch is the
      // fault-tolerant path
      val collected = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      def sink(df: org.apache.spark.sql.Dataset[StreamDedup.CandPair], id: Long): Unit =
        df.collect().foreach(p => collected.add(
          (math.min(p.id_a, p.id_b), math.max(p.id_a, p.id_b))))
      // one source across both query incarnations (offset log must
      // match on recovery); first incarnation: half the corpus, STOP
      val mem = MemoryStream[Doc]
      val q1 = StreamDedup.candidates(mem.toDF())
        .writeStream.foreachBatch(sink _)
        .outputMode("append").option("checkpointLocation", ckpt).start()
      mem.addData(b1.toSeq)
      q1.processAllAvailable()
      q1.stop()
      // second incarnation, SAME checkpoint: the ListState bucket
      // index must come back from RocksDB — batch-1 docs are never
      // offered again, yet cross-half pairs appear
      val q2 = StreamDedup.candidates(mem.toDF())
        .writeStream.foreachBatch(sink _)
        .outputMode("append").option("checkpointLocation", ckpt).start()
      mem.addData(b2.toSeq)
      q2.processAllAvailable()
      q2.stop()
      import scala.jdk.CollectionConverters._
      val got = collected.asScala.toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("q_stream_near_dups equals the batch q_minhash_near_dups end-to-end") {
    // round 11: the DECLARED streaming twin runs the portable md5
    // family end-to-end (candidatesPortable + md5 verify + round 6dp)
    // and shares q_minhash_near_dups' value gate — so stream ≡ batch
    // is row-for-row on the GATED queries themselves. The xxhash64
    // production machinery keeps its own equality gate below
    // ("streaming candidates equal the batch pipeline's").
    val stream = SparkEntry.queries("q_stream_near_dups")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = SparkEntry.queries("q_minhash_near_dups")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"missing=${(batch -- stream).take(5)} extra=${(stream -- batch).take(5)}")
  }
}
