package graft

import graft.functions.DotProductF
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY.md §2 J5): installs the
  * engine's custom functions at session build time —
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * }}}
  *
  * or via config (works with spark-submit, no code change):
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Also injects [[graft.plans.RewriteDotProduct]], the optimizer rule
  * that turns the interpreted higher-order-function dot-product fold
  * into the codegen'd expression automatically, and
  * [[graft.plans.AsOfJoinStrategy]], the planner strategy for the
  * whole-operator native as-of join ([[graft.plans.AsOfJoinPlan]] →
  * [[graft.plans.AsOfJoinExec]]; SURVEY.md §4.3 ladder (c)).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  /** Wrong-arity SQL calls should read as analysis errors naming the
    * function, not raw IndexOutOfBoundsExceptions from children(i).
    */
  private def checkArity(fn: String, children: Seq[Expression], n: Int): Unit =
    if (children.size != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${children.size}")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        checkArity("vec_dot", children, 2)
        DotProductF(children(0), children(1))
      }))
    e.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[graft.functions.CharNGrams].getName, "char_ngrams"),
      (children: Seq[Expression]) => {
        checkArity("char_ngrams", children, 2)
        graft.functions.CharNGrams(children(0), children(1))
      }))
    e.injectFunction((
      FunctionIdentifier("token_ngrams"),
      new ExpressionInfo(classOf[graft.functions.TokenNGrams].getName, "token_ngrams"),
      (children: Seq[Expression]) => {
        checkArity("token_ngrams", children, 2)
        graft.functions.TokenNGrams(children(0), children(1))
      }))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        checkArity("minhash_sig", children, 3)
        graft.functions.MinHashSig(children(0),
          graft.functions.ShingleScan.foldedInt(children(1), "minhash_sig n"),
          graft.functions.ShingleScan.foldedInt(children(2), "minhash_sig k"))
      }))
    e.injectFunction((
      FunctionIdentifier("minhash_sig_md5"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "minhash_sig_md5"),
      (children: Seq[Expression]) => {
        checkArity("minhash_sig_md5", children, 3)
        graft.functions.MinHashSig(children(0),
          graft.functions.ShingleScan.foldedInt(children(1), "minhash_sig_md5 n"),
          graft.functions.ShingleScan.foldedInt(children(2), "minhash_sig_md5 k"),
          md5 = true)
      }))
    e.injectFunction((
      FunctionIdentifier("simhash64_md5"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64_md5"),
      (children: Seq[Expression]) => {
        checkArity("simhash64_md5", children, 2)
        graft.functions.SimHash64(children(0),
          graft.functions.ShingleScan.foldedInt(children(1), "simhash64_md5 n"),
          md5 = true)
      }))
    e.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[graft.functions.WinnowFps].getName, "winnow_fps"),
      (children: Seq[Expression]) => {
        checkArity("winnow_fps", children, 3)
        graft.functions.WinnowFps(children(0),
          graft.functions.ShingleScan.foldedInt(children(1), "winnow_fps n"),
          graft.functions.ShingleScan.foldedInt(children(2), "winnow_fps w"))
      }))
    e.injectFunction((
      FunctionIdentifier("winnow_fps_md5"),
      new ExpressionInfo(classOf[graft.functions.WinnowFps].getName, "winnow_fps_md5"),
      (children: Seq[Expression]) => {
        checkArity("winnow_fps_md5", children, 3)
        graft.functions.WinnowFps(children(0),
          graft.functions.ShingleScan.foldedInt(children(1), "winnow_fps_md5 n"),
          graft.functions.ShingleScan.foldedInt(children(2), "winnow_fps_md5 w"),
          md5 = true)
      }))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        checkArity("simhash64", children, 2)
        graft.functions.SimHash64(children(0),
          graft.functions.ShingleScan.foldedInt(children(1), "simhash64 n"))
      }))
    e.injectFunction((
      FunctionIdentifier("ordered_pairs"),
      new ExpressionInfo(classOf[graft.functions.OrderedPairs].getName, "ordered_pairs"),
      (children: Seq[Expression]) => {
        checkArity("ordered_pairs", children, 1)
        graft.functions.OrderedPairs(children(0))
      }))
    e.injectFunction((
      FunctionIdentifier("payload_pairs"),
      new ExpressionInfo(classOf[graft.functions.PayloadPairs].getName, "payload_pairs"),
      (children: Seq[Expression]) => {
        checkArity("payload_pairs", children, 1)
        graft.functions.PayloadPairs(children(0))
      }))
    e.injectFunction((
      FunctionIdentifier("token_ngram_distinct"),
      new ExpressionInfo(classOf[graft.functions.TokenNGramDistinct].getName,
        "token_ngram_distinct"),
      (children: Seq[Expression]) => {
        checkArity("token_ngram_distinct", children, 2)
        graft.functions.TokenNGramDistinct(children(0),
          graft.functions.ShingleScan.foldedInt(children(1), "token_ngram_distinct n"))
      }))
    e.injectFunction((
      FunctionIdentifier("mask_pairs"),
      new ExpressionInfo(classOf[graft.functions.MaskPairs].getName, "mask_pairs"),
      (children: Seq[Expression]) => {
        checkArity("mask_pairs", children, 1)
        graft.functions.MaskPairs(children(0))
      }))
    e.injectFunction((
      FunctionIdentifier("token_ngram_stats"),
      new ExpressionInfo(classOf[graft.functions.TokenNGramStats].getName, "token_ngram_stats"),
      (children: Seq[Expression]) => {
        checkArity("token_ngram_stats", children, 2)
        graft.functions.TokenNGramStats(children(0),
          graft.functions.ShingleScan.foldedInt(children(1), "token_ngram_stats n"))
      }))
    e.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
    // AFTER the operator-optimization fixed point (inside it this rule
    // would fight PushDownPredicates forever): un-derive expensive
    // scalars that predicate pushdown substituted below their own
    // projection — each is computed once and referenced by attribute
    e.injectPreCBORule(_ => graft.plans.SingleEvalExpensive)
    // AQE-only (runtime stats in hand): final ORDER BY over a small
    // materialized input drops its range exchange + sampling job for a
    // single-partition sort — see SmallSortSinglePartition scaladoc
    e.injectRuntimeOptimizerRule(_ => graft.plans.SmallSortSinglePartition)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // intercept Spark's own logical AsOfJoin (Dataset.joinAsOf /
    // pandas merge_asof) before the optimizer's RewriteAsOfJoin
    // expands it into a pair-materializing join + min_by
    e.injectPostHocResolutionRule(_ => graft.plans.RewriteSparkAsOfJoin)
  }
}
