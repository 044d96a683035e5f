package graft.tools

import graft.SparkEnv
import org.apache.spark.sql.functions._

/** Dev harness (round 12, VERDICT r11 #6): measure the md5-vs-xxhash64
  * premium the round-11 value-gating conversion put on the DECLARED
  * `q_stream_near_dups`. Runs the SAME end-to-end pipeline shape as
  * the declared query (file stream → minhash → transformWithState
  * bucket index → memory sink → exact-Jaccard verify of the streamed
  * candidates) with both signature families at identical k/bands, and
  * prints per-variant min wall time. The only variable is the hash
  * family: xxhash64 (`StreamDedup.candidates`, the production
  * default) vs md5 (`candidatesPortable`, the oracle-replayable gated
  * form).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.HashAbProf [passes]"
  */
object HashAbProf {
  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.warmCpu(spark)
    val docSchema = graft.Tables.documents(spark, sfDir).schema

    def runOnce(md5: Boolean, tag: String): Double = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", graft.SparkEnv.stateParts)
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val qname = s"hash_ab_$tag"
      val t0 = System.nanoTime()
      val docsStream = graft.streaming.Ingest
        .streamTable(s2, sfDir, "documents", docSchema)
        .select(col("doc_id"), col("text"))
      val cands =
        if (md5) graft.streaming.StreamDedup.candidatesPortable(docsStream, k = 16, bands = 4)
        else graft.streaming.StreamDedup.candidates(docsStream, k = 16, bands = 4)
      val q = cands.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", SparkEnv.scratchDir(s"hash-ab-ckpt-$tag"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val cand = s2.table(qname)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
        .distinct()
      val n = graft.operators.Dedup
        .verifyCandidates(graft.Tables.documents(spark, sfDir), cand,
          portableHash = md5)
        .count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"  [$tag] pass: $t%.3f s ($n verified pairs)")
      t
    }

    var minX = Double.MaxValue
    var minM = Double.MaxValue
    for (p <- 1 to passes) {
      minX = math.min(minX, runOnce(md5 = false, s"xx$p"))
      minM = math.min(minM, runOnce(md5 = true, s"md$p"))
    }
    println(f"[hashab] xxhash64 min=$minX%.3f s  md5 min=$minM%.3f s  premium=${minM - minX}%.3f s")
    spark.stop()
  }
}
