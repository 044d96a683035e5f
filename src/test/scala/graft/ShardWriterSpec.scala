package graft

import graft.sources.ShardWriter
import org.apache.spark.sql.functions._

/** Training-shard layout: partition directories by (split, lang),
  * per-file row caps honored, lossless round trip, and deterministic
  * split membership across runs.
  */
class ShardWriterSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("shards land under split=/lang= dirs, capped rows per file, lossless") {
    val dir = SparkEnv.scratchDir("shards-spec")
    ShardWriter.writeShards(docs, dir, maxRecordsPerFile = 50)
    // layout: split-level then lang-level partition dirs
    val splits = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(splits.forall(_.startsWith("split=")), splits.toString)
    assert(splits.contains("split=train"), splits.toString)
    val langDirs = new java.io.File(s"$dir/split=train").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(langDirs.nonEmpty && langDirs.forall(_.startsWith("lang=")))
    // per-file row cap honored
    def parquetFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(parquetFiles)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
    val files = parquetFiles(new java.io.File(dir))
    assert(files.nonEmpty)
    files.foreach { f =>
      val n = spark.read.parquet(f.getPath).count()
      assert(n <= 50, s"${f.getName} has $n rows > cap")
    }
    // lossless round trip (partition columns come back as columns)
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    val origIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val backIds = back.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(backIds == origIds)
    // reading one (split, lang) partition prunes to its directory
    val pruned = spark.read.parquet(dir)
      .filter(col("split") === "train" && col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("split"), plan)
  }

  test("split membership is deterministic across runs") {
    val d1 = SparkEnv.scratchDir("shards-a")
    val d2 = SparkEnv.scratchDir("shards-b")
    ShardWriter.writeShards(docs, d1, maxRecordsPerFile = 50)
    ShardWriter.writeShards(docs.repartition(7), d2, maxRecordsPerFile = 25)
    def membership(dir: String) = spark.read.parquet(dir)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(membership(d1) == membership(d2),
      "content-hash split must not depend on partitioning or file caps")
  }
}
