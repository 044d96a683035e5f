package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler for the sketch pipelines (not part of the
  * driver contract). Times each stage of the minhash near-dup pipeline
  * independently at the given sf dir.
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count() // warm codegen
    graft.Bench.warmCpu(spark)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s -> $r")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    val sh = Dedup.shingles(docs)
    time("shingles.count")(sh.count())
    val sigs = Dedup.minhashSignatures(sh)
    time("signatures.count")(sigs.count())
    val cand = Dedup.minhashCandidates(docs).persist()
    time("candidates.count")(cand.count())
    import org.apache.spark.sql.functions._
    val candIds = cand.select(col("id_a").as("doc_id"))
      .union(cand.select(col("id_b").as("doc_id"))).distinct()
    time("candIds.count")(candIds.count())
    val candDocs = docs.join(candIds, Seq("doc_id"), "left_semi")
    time("candDocs.count")(candDocs.count())
    val verify = Dedup.shingleJaccard(candDocs, cand)
      .filter(col("jaccard") >= 0.5)
    time("verify.count")(verify.count())
    time("full minhashNearDups")(Dedup.minhashNearDups(docs).count())
    time("full (2nd run)")(Dedup.minhashNearDups(docs).count())
    time("simhashNearDups")(Dedup.simhashNearDups(docs).count())
    spark.stop()
  }
}
