package graft

import graft.operators.Hnsw
import org.apache.spark.sql.functions._

/** The persisted-index maintenance loop (round 15): incremental
  * upsert/delete applied IN PLACE to the shard-partitioned parquet
  * artifact via dynamic partition overwrite — the write path a
  * serving deployment actually runs (the byte laws in HnswSpec prove
  * the RELATION; these specs prove the DISK STATE, including that
  * untouched partitions' files are physically untouched, and drive
  * the whole loop through a real Structured Streaming ingest).
  */
class HnswPersistSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  private def persisted(dir: String): Array[String] =
    spark.read.parquet(dir)
      .select(col("shard"), col("vec_id"), col("level"), col("vec"), col("nbrs"))
      .orderBy("shard", "vec_id").collect().map(_.toString)

  private def relation(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.select(col("shard"), col("vec_id"), col("level"), col("vec"), col("nbrs"))
      .orderBy("shard", "vec_id").collect().map(_.toString)

  /** (file name, size, mtime) fingerprint of one shard partition. */
  private def shardFiles(dir: String, shard: Int): Seq[(String, Long, Long)] = {
    val d = new java.io.File(dir, s"shard=$shard")
    if (!d.isDirectory) Seq.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSeq.sortBy(_._1)
  }

  test("persisted upsert rewrites ONLY the owning shard partitions; " +
      "disk state equals the full rebuild") {
    val dir = SparkEnv.scratchDir("hnsw-persist-up")
    val maxId = emb.select(max("vec_id")).head.getLong(0)
    // tail batch confined to shard 2 — shards 0/1/3 must not be touched
    val old = emb.filter(col("vec_id") <= maxId - 40)
    val late = emb.filter(col("vec_id") > maxId - 40 &&
      pmod(col("vec_id"), lit(Hnsw.NumShards)) === 2)
    Hnsw.buildShardGraphs(old).write.mode("overwrite").partitionBy("shard").parquet(dir)
    val before = (0 until Hnsw.NumShards).map(s => s -> shardFiles(dir, s)).toMap
    val touched = Hnsw.upsertPersistedHnsw(spark, dir, late)
    assert(touched == Seq(2), s"only shard 2 owns the batch, got $touched")
    // disk state = the full-rebuild law, now ON the artifact
    assert(persisted(dir).sameElements(
      relation(Hnsw.buildShardGraphs(old.unionAll(late)))))
    // untouched partitions: bit-for-bit the same files
    for (s <- Seq(0, 1, 3))
      assert(shardFiles(dir, s) == before(s),
        s"untouched shard $s partition was rewritten")
    assert(shardFiles(dir, 2) != before(2), "owning shard must be rewritten")
  }

  test("persisted delete purges in place; a fully-purged shard's " +
      "directory vanishes; purge re-run is idempotent") {
    val dir = SparkEnv.scratchDir("hnsw-persist-del")
    Hnsw.buildShardGraphs(emb).write.mode("overwrite").partitionBy("shard").parquet(dir)
    val before = (0 until Hnsw.NumShards).map(s => s -> shardFiles(dir, s)).toMap
    // purge set: the gated predicate PLUS every id of shard 1
    val purge = emb.filter(Hnsw.purgedPredicate ||
      pmod(col("vec_id"), lit(Hnsw.NumShards)) === 1).select("vec_id")
    val touched = Hnsw.deletePersistedHnsw(spark, dir, purge)
    assert(touched.toSet == Set(0, 1, 2, 3))
    val survivors = emb.filter(!(Hnsw.purgedPredicate ||
      pmod(col("vec_id"), lit(Hnsw.NumShards)) === 1))
    assert(persisted(dir).sameElements(relation(Hnsw.buildShardGraphs(survivors))))
    assert(!new java.io.File(dir, "shard=1").exists(),
      "fully-purged shard directory must be removed")
    assert(shardFiles(dir, 0) != before(0), "owning shards must rewrite")
    // idempotent: purging again finds no owned ids, touches nothing
    assert(Hnsw.deletePersistedHnsw(spark, dir, purge).isEmpty)
    assert(persisted(dir).sameElements(relation(Hnsw.buildShardGraphs(survivors))))
  }

  test("continuous ingest: a REAL file stream of embedding chunks " +
      "upserts the persisted index to the full-build fixpoint, then the " +
      "purge leg removes the gated set — the complete index lifecycle") {
    val dir = SparkEnv.scratchDir("hnsw-persist-stream")
    // bootstrap: first quarter of ids; the stream delivers the rest in
    // three ascending chunks (the append fast path, mtime-ordered)
    val maxId = emb.select(max("vec_id")).head.getLong(0)
    val cuts = Seq(maxId / 4, maxId / 2, 3 * maxId / 4, maxId)
    Hnsw.buildShardGraphs(emb.filter(col("vec_id") <= cuts.head))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    val chunkDir = new java.io.File(SparkEnv.scratchDir("hnsw-chunks"))
    cuts.sliding(2).toSeq.zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      val staged = SparkEnv.scratchDir(s"hnsw-chunk-stage-$i")
      emb.filter(col("vec_id") > lo && col("vec_id") <= hi)
        .coalesce(1).write.mode("overwrite").parquet(staged)
      val part = new java.io.File(staged).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(chunkDir, f"chunk_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      require(dest.setLastModified(System.currentTimeMillis() - (10 - i) * 1000L))
    }
    val s2 = SparkEnv.stateSession(spark)
    val q = s2.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(chunkDir.getPath)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", SparkEnv.scratchDir("hnsw-stream-ckpt"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Hnsw.upsertPersistedHnsw(spark, dir, batch)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // fixpoint: the streamed index equals the one-shot full build
    assert(persisted(dir).sameElements(relation(Hnsw.buildShardGraphs(emb))))
    // purge leg on the live artifact; search serves survivors only
    Hnsw.deletePersistedHnsw(spark, dir,
      emb.filter(Hnsw.purgedPredicate).select("vec_id"))
    assert(persisted(dir).sameElements(relation(
      Hnsw.buildShardGraphs(emb.filter(!Hnsw.purgedPredicate)))))
    val purgedIds = emb.filter(Hnsw.purgedPredicate)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val hits = Hnsw.annHnsw(spark.read.parquet(dir)
        .select(col("shard"), col("vec_id"), col("level"), col("vec"), col("nbrs")),
      emb.filter(col("vec_id") < 5))
      .select("vec_id").collect().map(_.getLong(0))
    assert(hits.nonEmpty && hits.forall(!purgedIds.contains(_)))
  }
}
