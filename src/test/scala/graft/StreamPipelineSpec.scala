package graft

import graft.operators.Dedup
import graft.streaming.{CorpusGate, StreamPipeline}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The composed streaming cleaning pipeline (gate → LSH near-dup →
  * shard-ready output) equals the batch funnel + near-dup composition
  * on identical input, across any micro-batch split.
  */
object StreamPipelineSpec {
  case class Doc(doc_id: Long, lang: String, n_chars: Long, text: String)
}

class StreamPipelineSpec extends SparkSpec {
  import StreamPipelineSpec.Doc

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

  test("composed stream equals the batch gate + near-dup composition") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)

    // batch twin: gate survivors minus docs that are the LATER side of
    // any LSH candidate pair among the survivors
    val gated = docs.join(
      CorpusGate.flags(docs)
        .filter(col("lang_ok") && col("len_ok") && col("rep_ok"))
        .select("doc_id"),
      Seq("doc_id"), "left_semi")
    val rejected = Dedup.minhashCandidates(gated)
      .select(col("id_b").as("doc_id")).distinct()
    val expected = gated.join(rejected, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty, "fixture should have gate+dedup survivors")
    val nGated = gated.count()
    assert(expected.size < nGated, "near-dup stage should reject something")

    // the stream, fed the same docs ascending in three micro-batches
    // (ascending arrival = the batch composition's id orientation)
    val rows = docs.select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"), col("text"))
      .as[Doc].collect().sortBy(_.doc_id)
    val outDir = SparkEnv.scratchDir("stream-pipeline-out")
    withRocksDb {
      val mem = MemoryStream[Doc]
      val q = StreamPipeline.run(mem.toDF(), outDir,
        SparkEnv.scratchDir("stream-pipeline-ckpt"))
      val chunks = rows.grouped((rows.length + 2) / 3).toSeq
      chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
      // replay the last chunk: already-indexed docs must emit nothing
      mem.addData(chunks.last.toSeq)
      q.processAllAvailable()
      q.stop()
    }

    val written = spark.read.parquet(outDir)
    val got = written.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // shard-ready: batch=/lang= partitioned layout with payload intact
    assert(written.columns.toSet == Set("doc_id", "text", "batch", "lang"))
    val langs = written.select("lang").distinct().collect()
      .map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr")) && langs.nonEmpty,
      s"unexpected shard partitions: $langs")
  }

  test("portable composed stream equals the batch portable composition across splits") {
    // the md5/raw-tuple path under the round-11 q_stream_clean_pipeline
    // value gate: admitted set = gate survivors minus later-side docs
    // of portable LSH candidates, stable across ascending-id splits
    // and under replay
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val gated = docs.join(
      CorpusGate.flags(docs)
        .filter(col("lang_ok") && col("len_ok") && col("rep_ok"))
        .select("doc_id"),
      Seq("doc_id"), "left_semi")
    val rejected = Dedup.minhashCandidatesPortable(gated)
      .select(col("id_b").as("doc_id")).distinct()
    val expected = gated.join(rejected, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty && expected.size < gated.count())

    val rows = docs.select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"), col("text"))
      .as[Doc].collect().sortBy(_.doc_id)
    withRocksDb {
      val mem = MemoryStream[Doc]
      val q = StreamPipeline.verdictsPortable(mem.toDF())
        .writeStream.format("memory").queryName("pipe_portable")
        .outputMode("append")
        .option("checkpointLocation", SparkEnv.scratchDir("pipe-portable-ckpt"))
        .start()
      val chunks = rows.grouped((rows.length + 2) / 3).toSeq
      chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
      mem.addData(chunks.last.toSeq) // replay adds nothing
      q.processAllAvailable()
      q.stop()
      val got = spark.table("pipe_portable")
        .groupBy("doc_id").agg(max(col("dup")).as("dup"))
        .filter(!col("dup")).collect().map(_.getLong(0)).toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("scored stream shard drop equals the batch score+gate composition") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Importance
    val docs = Tables.documents(spark, sf)

    // batch twin: gate -> near-dup keep -> DSIR score vs the frozen
    // model -> absolute weight gate -> content-hash split layout
    val gated = docs.join(
      CorpusGate.flags(docs)
        .filter(col("lang_ok") && col("len_ok") && col("rep_ok"))
        .select("doc_id"),
      Seq("doc_id"), "left_semi")
    val rejected = Dedup.minhashCandidates(gated)
      .select(col("id_b").as("doc_id")).distinct()
    val kept = gated.join(rejected, Seq("doc_id"), "left_anti")
    val model = Importance.trainRatioModel(docs, col("lang") === "en")
    val (_, wCol) = Importance.scoreColumns(model)
    val weights = kept.withColumn("weight", wCol)
      .select("doc_id", "weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // median weight: the gate must drop some docs and keep some
    val minWeight = weights.values.toSeq.sorted.apply(weights.size / 2)
    val expected = graft.sources.ShardWriter.withSplit(
        kept.withColumn("weight", wCol).filter(col("weight") >= minWeight))
      .select("doc_id", "split", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(expected.nonEmpty && expected.size < weights.size,
      s"threshold should split the kept set: ${expected.size}/${weights.size}")

    val rows = docs.select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"), col("text"))
      .as[Doc].collect().sortBy(_.doc_id)
    val outDir = SparkEnv.scratchDir("stream-scored-out")
    withRocksDb {
      val mem = MemoryStream[Doc]
      // ascending arrival in two pre-loaded blocks; AvailableNow drains
      rows.grouped((rows.length + 1) / 2).foreach(c => mem.addData(c.toSeq))
      val q = StreamPipeline.runScoredAvailableNow(mem.toDF(), outDir,
        SparkEnv.scratchDir("stream-scored-ckpt"), model, minWeight)
      q.awaitTermination()
    }
    val written = spark.read.parquet(outDir)
    val got = written.select("doc_id", "split", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // scored metadata rides along; weights equal the batch scoring
    val wGot = written.select("doc_id", "weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wGot.forall { case (id, w) => weights(id) == w },
      "stream weights must bit-match the batch scoreColumns path")
  }

  test("writeBatch is idempotent: replaying a batch id does not duplicate docs") {
    // the exactly-once window: a crash between the parquet write and
    // the checkpoint commit replays the same micro-batch — its write
    // must overwrite its own batch= partition, not append a copy
    import spark.implicits._
    val verdictRows = Seq(
      graft.streaming.StreamPipeline.DocVerdict(1L, "en", "kept doc", dup = false),
      graft.streaming.StreamPipeline.DocVerdict(1L, "en", "kept doc", dup = false),
      graft.streaming.StreamPipeline.DocVerdict(2L, "de", "dup doc", dup = true))
    val outDir = SparkEnv.scratchDir("stream-pipeline-idem")
    val ds = verdictRows.toDS()
    graft.streaming.StreamPipeline.writeBatch(ds, 7L, outDir)
    graft.streaming.StreamPipeline.writeBatch(ds, 7L, outDir) // replay
    val got = spark.read.parquet(outDir)
    assert(got.count() == 1L, s"replay duplicated rows: ${got.count()}")
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // a different batch id lands in its own partition
    graft.streaming.StreamPipeline.writeBatch(
      Seq(graft.streaming.StreamPipeline.DocVerdict(3L, "fr", "next", dup = false))
        .toDS(), 8L, outDir)
    assert(spark.read.parquet(outDir).count() == 2L)
  }

  test("verdict rollup: a doc is kept iff no bucket saw an earlier member") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // hand-built corpus: two near-identical long docs (dup pair) and
    // one unrelated long doc; all pass the gate (en, >= 100 chars,
    // low repetition)
    def longText(seed: String) =
      (1 to 30).map(i => s"$seed word$i token$i").mkString(" ")
    val a = Doc(1L, "en", 200L, longText("alpha"))
    val b = Doc(2L, "en", 200L, longText("alpha")) // byte-identical text
    val c = Doc(3L, "en", 200L, longText("gamma"))
    val outDir = SparkEnv.scratchDir("stream-pipeline-mini")
    withRocksDb {
      val mem = MemoryStream[Doc]
      val q = StreamPipeline.run(mem.toDF(), outDir,
        SparkEnv.scratchDir("stream-pipeline-mini-ckpt"))
      mem.addData(a)
      q.processAllAvailable()
      mem.addData(b, c) // b collides with a in every band; c nowhere
      q.processAllAvailable()
      q.stop()
    }
    val got = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L), got.toString)
  }
}
