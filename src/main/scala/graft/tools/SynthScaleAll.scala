package graft.tools

import graft.{SparkEntry, SparkEnv}

/** Round-15 (VERDICT r14 #5): the FULL declared library through one
  * synthetic decade. SCALING.md's earlier sweeps cover subsets (facts,
  * documents/embeddings, graph, artifacts); a hidden super-linear term
  * in an unswept query would only surface in production. This builds
  * ONE combined sf~1 directory — fact replicas with key offsets
  * ([[SynthScaleFacts.synthesize]]: orders/customers/users/suppliers
  * are scaling dimensions, parts/calendars are not) overlaid with the
  * DECORRELATED document/embedding replicas ([[SynthScale.synthesize]]:
  * alphabet-rotated text, orthogonally transformed vectors — 10× more
  * corpus, not 10× more duplicates) — and times EVERY declared query
  * at sf0.1 vs sf~1, min over passes, streaming twins included (their
  * chunked-ingest/checkpoint scaffolding is dir-generic).
  *
  * Verdict: linear growth on the 10× decade is ratio ≲ 10 (usually
  * far less — the per-action floor and artifact builds amortize);
  * ratio > 10 flags a super-linear term and fails the printed verdict
  * line. The table is pasted into SCALING.md.
  *
  *   sbt "runMain graft.tools.SynthScaleAll [query ...]"
  */
object SynthScaleAll {
  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_ALL_DIR",
      SparkEnv.scratchRoot + "/synth-sf1-all")
    val spark = SparkEnv.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!new java.io.File(s"$out/embeddings.parquet").exists() ||
        !new java.io.File(s"$out/events.parquet").exists()) {
      SynthScaleFacts.synthesize(spark, base, out) // facts + dims
      SynthScale.synthesize(spark, base, out) // decorrelated docs/embs
    }
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      graft.Bench.warmCpu(spark)
    } catch { case _: Throwable => }
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val passes = 2
    println(s"full-library synthetic decade: ${names.size} queries, min of $passes passes")
    println("| query | sf0.1 s | sf~1 s | decade ratio | rows 0.1 | rows 1 |")
    println("|---|---|---|---|---|---|")
    val flagged = scala.collection.mutable.ArrayBuffer[(String, Double)]()
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
      try {
        val (t01, r01) = run(base)
        val (t1, r1) = run(out)
        val ratio = t1 / t01
        if (ratio > 10.0) flagged += name -> ratio
        println(f"| $name | $t01%.3f | $t1%.3f | $ratio%.2f× | $r01 | $r1 |")
      } catch {
        case e: Throwable =>
          flagged += name -> Double.NaN
          println(s"| $name | ERR | ERR | — | — | — |  <!-- ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)} -->")
      }
    }
    if (flagged.isEmpty)
      println(s"\nverdict: no super-linear outliers (all ${names.size} ratios <= 10x on the 10x decade)")
    else
      println("\nverdict: FLAGGED " + flagged.map { case (n, r) =>
        if (r.isNaN) s"$n (ERROR)" else f"$n ($r%.1fx)" }.mkString(", "))
    spark.stop()
  }
}
