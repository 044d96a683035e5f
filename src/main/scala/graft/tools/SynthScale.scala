package graft.tools

import graft.{SparkEntry, SparkEnv}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (round-8 verdict #9): one more measured decade for the
  * dedup/ANN families, whose 100 TB claims were extrapolated from
  * ≤ sf0.1. Synthesizes an sf~1 corpus (10× documents + embeddings)
  * from the sf0.1 fixtures by replica-unioning with id offsets, then
  * times the K-family queries at sf0.1 vs sf~1 and prints the decade
  * ratios in the ScaleSweep format.
  *
  * Replicas must be DECORRELATED or the decade is dishonest in the
  * other direction: byte-identical copies make every doc a 10-way
  * near-duplicate, so LSH bucket sizes grow 10× and the within-bucket
  * pair expansion 100× — measuring "10× more duplicated corpus", not
  * "10× more corpus". Decorrelation is deterministic:
  *  - text: per-replica Caesar rotation of the lowercase alphabet
  *    (`translate`) — token structure, lengths, and the planted
  *    within-replica dup families are preserved exactly; shingle sets
  *    across replicas are disjoint (the ~30-word vocabulary shares no
  *    rotated words).
  *  - embeddings: per-replica deterministic dimension ROTATION (shift
  *    by 7·replica mod 64) composed with a ±1 sign pattern per
  *    dimension (murmur3 of (dim, replica)) — both are orthogonal
  *    transforms, so within-replica cosine geometry is EXACTLY
  *    invariant, while cross-replica dot products of the same vector
  *    become lagged autocorrelations with scrambled signs. Sign flips
  *    alone were measured insufficient: the fixture's cluster vectors
  *    concentrate mass in a few dimensions, so Σ v_i² ε_i stayed near
  *    ±1 often enough that q_embed_near_dup's output grew 107× (the
  *    13.5× wall-clock decade recorded in round 9's first sweep was a
  *    synthesis artifact — more TRUE pairs — not operator behavior).
  *
  *   sbt "runMain graft.tools.SynthScale [query ...]"
  */
object SynthScale {
  private val defaults = Seq(
    "q_exact_dedup", "q_minhash_near_dups", "q_simhash_near_dups",
    "q_near_dup_pairs", "q_winnow_fingerprints", "q_passage_overlap",
    "q_containment_pairs", "q_substring_spans", "q_token_df",
    "q_dsir_weights", "q_lsh_semantic_dedup", "q_dedup_clusters",
    "q_domain_rank", "q_language_id",
    "q_cosine_topk", "q_embed_near_dup", "q_ann_ivf",
    // round-10 (VERDICT r9 task #7): PMI is documents-shaped — its
    // decade belongs here, not in SynthScaleFacts (which copies
    // documents unchanged). The alphabet-rotated replicas grow the
    // bigram vocabulary ~10× while each replica keeps the base
    // corpus's distribution, so margins/support scale honestly.
    "q_pmi", "q_entropy")

  private val replicas = 10
  private val idOffset = 10000000L

  def synthesize(spark: SparkSession, base: String, out: String): Unit = {
    val abc = "abcdefghijklmnopqrstuvwxyz"
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val docReplicas = (0 until replicas).map { r =>
      val rotated = abc.drop(r) + abc.take(r)
      docs.select(
        (col("doc_id") + lit(r * idOffset)).as("doc_id"),
        translate(col("text"), abc, rotated).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    docReplicas.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val embReplicas = (0 until replicas).map { r =>
      emb.select(
        (col("vec_id") + lit(r * idOffset)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> " +
          s"element_at(embedding, pmod(i + 7 * $r, 64) + 1) * " +
          s"CAST(1 - 2 * pmod(hash(i, $r), 2) AS FLOAT))")
          .as("embedding"),
        col("label"))
    }
    embReplicas.reduce(_ unionByName _)
      .repartition(8).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else defaults
    val base = "/root/testdata/sf0.1"
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
      SparkEnv.scratchRoot + "/synth-sf1")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!new java.io.File(s"$out/embeddings.parquet").exists())
      synthesize(spark, base, out)
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      graft.Bench.warmCpu(spark)
    } catch { case _: Throwable => }
    val passes = 2
    println("| query | sf0.1 s | sf~1 s | decade ratio | rows 0.1 | rows 1 |")
    println("|---|---|---|---|---|---|")
    var worst = ("", 0.0)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      def run(sf: String): (Double, Long) = {
        var rows = 0L
        val t = (1 to passes).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          rows = fn(spark, sf).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }.min
        (t, rows)
      }
      val (t01, r01) = run(base)
      val (t1, r1) = run(out)
      val ratio = t1 / t01
      if (ratio > worst._2) worst = (name, ratio)
      println(f"| $name | $t01%.3f | $t1%.3f | $ratio%.2f× | $r01 | $r1 |")
    }
    println(f"\nworst decade ratio: ${worst._1} at ${worst._2}%.2f× " +
      "(10× corpus; > 10× flags super-linear growth)")
    spark.stop()
  }
}
