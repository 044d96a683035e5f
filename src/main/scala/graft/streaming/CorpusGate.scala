package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous ingest quality gate — the cleaning funnel's streaming
  * twin (SURVEY.md §2 K8 × I-family): language keep-list → length →
  * repetition, evaluated per arriving micro-batch with running
  * cumulative-survival counters. Every flag is a STATELESS codegen'd
  * projection (the fused `token_ngram_stats` expression included), so
  * the only stateful operator is the single global counter aggregate —
  * tiny state, no watermark needed, and the stream's counters equal
  * the batch funnel's by construction (the declared query is gated on
  * exactly that: the DuckDB oracle recomputes the batch form).
  *
  * The near-dup stage is deliberately absent here: it needs the
  * cross-doc pair relation, whose streaming form is the LSH bucket
  * index ([[StreamDedup]]) — compose the two gates in sequence, not
  * one operator.
  */
object CorpusGate {

  /** Per-doc gate flags — the ONE definition of the keep-list, length
    * threshold, and repetition cutoff; the batch funnel
    * ([[graft.queries.Pipeline.corpusFunnel]]) and the streaming gate
    * both build on it, so the two can't drift apart in code (their
    * oracles gate each independently). Keeps `doc_id` so batch callers
    * can join further per-doc flags (the funnel's near-dup stage).
    */
  def flags(docs: DataFrame): DataFrame =
    withFlags(docs).select("doc_id", "lang_ok", "len_ok", "rep_ok")

  /** All input columns + the gate flags (the write-path shape: the
    * payload survives alongside the flags).
    */
  def withFlags(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    docs
      .withColumn("st",
        toColumn(graft.functions.TokenNGramStats(toExpression(col("text")), 3)))
      .withColumn("lang_ok", col("lang").isin("en", "de", "es", "fr"))
      .withColumn("len_ok", col("n_chars") >= 100)
      .withColumn("rep_ok",
        col("st.n_top").cast("double") / col("st.n_grams") < 0.1)
      .drop("st")
  }

  private def stageAggs = Seq(
    count(lit(1)).as("c0"),
    count(when(col("lang_ok"), 1)).as("c1"),
    count(when(col("lang_ok") && col("len_ok"), 1)).as("c2"),
    count(when(col("lang_ok") && col("len_ok") && col("rep_ok"), 1)).as("c3"))

  /** Cumulative-survival counters over a (streaming or batch) doc
    * frame; complete-mode friendly (one global aggregate row, stacked
    * into per-stage rows).
    */
  def stageCounters(docs: DataFrame): DataFrame =
    flags(docs).agg(stageAggs.head, stageAggs.tail: _*)
      .selectExpr("stack(4, '0_total', c0, '1_lang', c1, '2_length', c2, " +
        "'3_repetition', c3) AS (stage, n_docs)")

  /** The cleaned (gate-surviving) corpus WITH its funnel accounting
    * fused into whatever action the caller runs — `observe()` collects
    * the per-stage counters as the write's own scan streams by, so the
    * pipeline books its survival numbers WITHOUT a second pass over
    * the corpus (at 100 TB a separate counting pass is a second full
    * read). Usage:
    *
    *   val (clean, obs) = CorpusGate.observedClean(docs)
    *   ShardWriter.writeShards(clean, outDir)   // one action
    *   val counters = obs.get                   // c0..c3 from that action
    *
    * `obs.get` blocks until an action on the returned frame completes;
    * counters are per-action (re-running the action re-fills them).
    */
  def observedClean(docs: DataFrame, name: String = "corpus_gate")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation(name)
    val clean = withFlags(docs)
      .observe(obs, stageAggs.head, stageAggs.tail: _*)
      .filter(col("lang_ok") && col("len_ok") && col("rep_ok"))
      .drop("lang_ok", "len_ok", "rep_ok")
    (clean, obs)
  }
}
