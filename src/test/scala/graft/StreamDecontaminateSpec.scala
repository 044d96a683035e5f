package graft

import graft.streaming.StreamDecontaminate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object StreamDecontaminateSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamDecontaminateSpec extends SparkSpec {
  import StreamDecontaminateSpec.Doc
  import spark.implicits._

  private val gram8 = (1 to 8).map(i => s"tok$i").mkString(" ")

  test("gram_set_hits equals the relational shingle-join count on the fixture") {
    val docs = Tables.documents(spark, sf)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val sorted = StreamDecontaminate.benchGramHashes(bench)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val fused = StreamDecontaminate.verdicts(train, sorted)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // relational twin: explode train shingles, semi-count against the
    // bench DISTINCT gram-hash relation
    val benchHs = graft.operators.Dedup.shingleRows(bench, 8)
      .select(xxhash64(col("shingle")).as("h")).distinct()
    val relational = graft.operators.Dedup.shingleRows(train, 8)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
      .join(benchHs, "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == relational,
      s"diff=${(fused.toSet diff relational.toSet).take(3)} / " +
        s"${(relational.toSet diff fused.toSet).take(3)}")
    assert(fused.nonEmpty, "fixture should contain contaminated docs")
  }

  test("planted contamination is flagged with exact instance counts") {
    val bench = Seq(Doc(10L, s"prefix $gram8 suffix")).toDS.toDF
    val sorted = StreamDecontaminate.benchGramHashes(bench)
    val train = Seq(
      // shares exactly the full 8-gram once
      Doc(1L, s"zzz $gram8 qqq"),
      // clean: same tokens but one swapped breaks every 8-gram
      Doc(2L, s"zzz ${gram8.replace("tok4", "other")} qqq"),
      // the bench gram appears twice -> two instance hits
      Doc(3L, s"$gram8 mid $gram8")).toDS.toDF
    val got = StreamDecontaminate.verdicts(train, sorted)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) >= 1L)
    assert(!got.contains(2L), got.toString)
    assert(got(3L) >= 2L && got(3L) > got(1L), got.toString)
  }

  test("short docs use whole-text-once semantics, matching the oracle CASE") {
    // both sides shorter than 8 tokens: contamination iff texts equal
    val bench = Seq(Doc(10L, "tiny bench doc")).toDS.toDF
    val sorted = StreamDecontaminate.benchGramHashes(bench)
    val train = Seq(
      Doc(1L, "tiny bench doc"),      // identical short text -> hit
      Doc(2L, "tiny bench"),          // prefix only -> clean
      Doc(3L, null)).toDS.toDF        // NULL text -> no verdict
    val got = StreamDecontaminate.verdicts(train, sorted)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L), got.toString)
  }

  test("streaming verdicts equal batch across micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq(Doc(10L, s"a $gram8 b")).toDS.toDF
    val sorted = StreamDecontaminate.benchGramHashes(bench)
    val docs = Seq(
      Doc(1L, s"x $gram8 y"), Doc(2L, "all clean here truly"),
      Doc(3L, s"$gram8"), Doc(4L, "tiny"))
    val mem = MemoryStream[Doc]
    val q = StreamDecontaminate.verdicts(mem.toDF(), sorted)
      .writeStream.format("memory").queryName("stream_decontam_spec")
      .outputMode("append")
      .option("checkpointLocation", SparkEnv.scratchDir("decontam-spec-ckpt"))
      .start()
    mem.addData(docs.take(2))
    q.processAllAvailable()
    mem.addData(docs.drop(2))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_decontam_spec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = StreamDecontaminate.verdicts(docs.toDS.toDF, sorted)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"$streamed vs $batch")
    assert(streamed.keySet == Set(1L, 3L))
  }

  test("cachedBenchGramHashes builds once per key") {
    val docs = Tables.documents(spark, sf)
    val k = s"decontam-spec-${System.nanoTime()}"
    val a = StreamDecontaminate.cachedBenchGramHashes(docs.limit(3), k)
    val b = StreamDecontaminate.cachedBenchGramHashes(docs.limit(9), k)
    assert(a eq b)
  }
}
