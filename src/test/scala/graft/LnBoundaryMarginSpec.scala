package graft

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Alias, Exp, Expm1, Expression, Floor, Log, Log10, Log1p, Log2, Logarithm, Pow, Round}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-10 hardening (VERDICT r9 task #2): every hash-gated query
  * that quantizes a transcendental (`round(ln(·), k)` → DECIMAL) rides
  * the assumption that a last-ulp difference between JVM `Math.log`
  * and DuckDB's libm `log` cannot flip the k-dp HALF_UP rounding.
  * q_pmi proved the assumption CAN fail when a ranking key rides the
  * quantization. This spec measures the assumption instead of trusting
  * it: for each audited query it walks the analyzed plan, finds every
  * `Round(child: double, k)` site, and classifies it:
  *
  *  - TRANSCENDENTAL (child computes through Log/Log10/Exp/Pow/…):
  *    engines may disagree by ~1 ulp, so the margin is load-bearing.
  *    The probe re-evaluates the PRE-ROUND child values against the
  *    node's own input relation and asserts every value's exact
  *    decimal distance from its nearest rounding boundary
  *    ((m+0.5)·10⁻ᵏ) exceeds 2 ulp — outside that band no
  *    correctly-rounded-to-1-ulp libm can land on the other side.
  *  - ROUND OVER A RAW DOUBLE AGGREGATE (sum/avg/stddev/corr over
  *    DoubleType inputs): FORBIDDEN outright — the cross-engine error
  *    is merge-order-dependent and unbounded by ulps, so no margin
  *    makes the gate stable (this detector is what caught
  *    q_stats_funcs' var_samp sitting 6e-11 from a boundary at
  *    magnitude 1e7). The cure is the exact-moments closed form
  *    (Regression.scala discipline) or per-term decimal quantization.
  *  - EXACT-OPERAND ARITHMETIC (divisions/sqrt of exact integer or
  *    decimal moments): deterministic by construction — both engines
  *    evaluate the same IEEE expression on identical operands (sqrt is
  *    correctly rounded) — recorded as exempt, no margin needed.
  *
  * The probe is generic plan surgery, not a per-query recompute, so it
  * cannot drift from the query it audits: per-term quantizations
  * inside aggregations (PSI terms, LM gram log-probs, entropy terms)
  * are probed per input row by projecting the Round's child over the
  * Aggregate's child; post-aggregation rounds re-run the aggregate
  * un-rounded. Margins are screened distributed (coarse double grid
  * distance, keep the 64 tightest) and then re-checked EXACTLY on the
  * driver via full-precision binary→decimal conversion.
  *
  * Runs at sf0.01 AND sf0.1 — the two driver-graded scales; margins
  * are fixture-determined, so green here means the gate cannot flake
  * across engines/runs at the scales the driver grades.
  */
class LnBoundaryMarginSpec extends SparkSpec {

  /** The ln-quantizing gated queries (VERDICT r9 list + the grep'd
    * rest of the family). q_chi2_independence/q_benford/q_ks_test/
    * q_welch_ttest are audited too: they emit rounds of exact-operand
    * arithmetic, and the walk proves no transcendental or
    * double-aggregate site hides in their plans. Streaming twins share
    * the batch formulas and fixtures, so the batch query's margins
    * cover them.
    */
  private val audited = Seq(
    "q_pmi", "q_lm_perplexity", "q_lm_quality_buckets", "q_dsir_weights",
    "q_bm25_topk", "q_psi_drift", "q_chi2_independence", "q_benford",
    "q_entropy", "q_token_df", "q_weighted_sample", "q_ks_test",
    "q_welch_ttest", "q_stats_funcs", "q_type_correlation", "q_math_funcs")

  /** Round 11: the LM declared queries score through the train-once
    * LmDocScore artifact, so their round(ln·,9) sites moved OUT of the
    * declared plans and into the model-training relations (collected
    * once per corpus by trainLmArtifact). Audit THOSE plans instead —
    * bigram log-probs for one entry; unigram + OOV-floor (cross-joined
    * so both sites sit in one plan) for the other. Same quantized
    * values flow into both the artifact and the oracle's replay.
    */
  private val customPlans: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    "q_lm_perplexity" -> ((s, d) => {
      val en = Tables.documents(s, d).filter(col("lang") === "en")
      graft.operators.LanguageModel.bigramModel(en)
    }),
    "q_lm_quality_buckets" -> ((s, d) => {
      val en = Tables.documents(s, d).filter(col("lang") === "en")
      val stats = graft.operators.LanguageModel.unigramStats(en)
      graft.operators.LanguageModel.unigramModel(stats)
        .crossJoin(graft.operators.LanguageModel.floorModel(stats))
    }))

  /** halfBoundary=true: a Round(·,k) site — boundaries at
    * (m+0.5)·10⁻ᵏ. halfBoundary=false: a Floor quantization site
    * (`floor(x·10ᵏ + 0.5)` micro-unit coding) probed on floor's full
    * argument — boundaries at integers.
    */
  private case class Site(query: String, node: String, scale: Int,
      halfBoundary: Boolean, transcendental: Boolean, probe: LogicalPlan)

  private def isTranscendental(e: Expression): Boolean = e.exists {
    case _: Log | _: Log10 | _: Log2 | _: Log1p | _: Logarithm |
        _: Exp | _: Expm1 | _: Pow => true
    case _ => false
  }

  /** Every Round-over-double site in the query's analyzed plan, each
    * paired with a plan that emits the site's pre-round values.
    * Fails the suite on a Round over a raw double aggregate.
    */
  private def sites(name: String, sfDir: String): Seq[Site] = {
    val analyzed = customPlans.getOrElse(name, SparkEntry.queries(name))
      .apply(spark, sfDir).queryExecution.analyzed
    val out = scala.collection.mutable.ArrayBuffer[Site]()
    def probeFor(node: LogicalPlan, child: Expression,
        desc: String): LogicalPlan = {
      val aggsInside = child.collect { case ae: AggregateExpression => ae }
      val doubleAgg = aggsInside.find(
        _.aggregateFunction.children.exists(_.dataType == DoubleType))
      assert(doubleAgg.isEmpty,
        s"$name: $desc over a raw double aggregate " +
          s"(${doubleAgg.map(_.sql).getOrElse("")}) — merge-order-" +
          "dependent, unstable across engines at ANY margin; use " +
          "exact moments or per-term quantization")
      node match {
        case a: Aggregate if aggsInside.nonEmpty =>
          Aggregate(a.groupingExpressions, Seq(Alias(child, "v")()), a.child)
        case _ if aggsInside.isEmpty && node.children.size == 1 =>
          Project(Seq(Alias(child, "v")()), node.children.head)
        case other =>
          fail(s"$name: unprobeable $desc site in ${other.nodeName}")
      }
    }
    analyzed.foreach { node =>
      node.expressions.foreach(_.foreach {
        case r: Round if r.child.dataType == DoubleType =>
          val k = r.scale.eval().asInstanceOf[Number].intValue()
          out += Site(name, node.nodeName, k, halfBoundary = true,
            isTranscendental(r.child),
            probeFor(node, r.child, s"round(·,$k)"))
        case f: Floor if f.child.dataType == DoubleType &&
            isTranscendental(f.child) =>
          // micro-unit coding floor(x·10ᵏ + 0.5): quantization flips
          // where floor's ARGUMENT crosses an integer — probe it whole
          out += Site(name, node.nodeName, 0, halfBoundary = false,
            transcendental = true, probeFor(node, f.child, "floor(·)"))
        case _ => ()
      })
    }
    out.toSeq
  }

  /** Exact distance of v from its nearest quantization boundary, via
    * full-precision binary→decimal conversion (BigDecimal.valueOf
    * would shorten to the toString repr and hide a knife edge).
    * halfBoundary: (m+0.5)·10⁻ᵏ grid (Round sites); else integer grid
    * (Floor sites, k=0).
    */
  private def exactMargin(v: Double, k: Int, halfBoundary: Boolean): BigDecimal = {
    val t = BigDecimal(new java.math.BigDecimal(v)) * BigDecimal(10).pow(k)
    val frac = t - t.setScale(0, BigDecimal.RoundingMode.FLOOR)
    if (halfBoundary) (frac - BigDecimal("0.5")).abs / BigDecimal(10).pow(k)
    else frac.min(BigDecimal(1) - frac) / BigDecimal(10).pow(k)
  }

  private def checkSite(s: Site, sfDir: String): (Long, Double) = {
    val df = GraftSqlBridge.ofRows(spark, s.probe)
      .filter(col("v").isNotNull && !isnan(col("v")) &&
        col("v") =!= Double.PositiveInfinity &&
        col("v") =!= Double.NegativeInfinity)
    // coarse screen: distance from the nearest boundary in grid units;
    // double arithmetic here is only used to FIND the tightest
    // candidates (its own error ≲1e-5 grid units), never to certify
    // them — keep 64 and certify exactly on the driver
    val scaled = col("v") * math.pow(10, s.scale)
    val dist =
      if (s.halfBoundary) abs(scaled - floor(scaled) - lit(0.5))
      else {
        val frac = scaled - floor(scaled)
        least(frac, lit(1.0) - frac)
      }
    val coarse = df.select(col("v"), dist.as("d")).orderBy(col("d")).limit(64)
    val rows = coarse.collect()
    val n = df.count()
    var minMargin = Double.MaxValue
    rows.foreach { r =>
      val v = r.getDouble(0)
      val m = exactMargin(v, s.scale, s.halfBoundary)
      val floor2Ulp = BigDecimal(new java.math.BigDecimal(2 * math.ulp(v)))
      assert(m > floor2Ulp,
        s"${s.query} ${s.node} round(·,${s.scale}) at $sfDir: value $v " +
          s"sits ${m} from a boundary (≤ 2 ulp = ${floor2Ulp}) — the " +
          "quantization can flip across engines")
      minMargin = math.min(minMargin, m.toDouble)
    }
    (n, if (rows.isEmpty) Double.NaN else minMargin)
  }

  for (sfDir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
    val sfName = sfDir.split('/').last
    test(s"ln-gate boundary margins exceed 2 ulp at $sfName") {
      val ledger = audited.flatMap { q =>
        val ss = sites(q, sfDir)
        assert(ss.nonEmpty, s"$q declares no Round-over-double site — " +
          "drop it from the audit list or the gate moved")
        ss.map { s =>
          if (s.transcendental) {
            val (n, m) = checkSite(s, sfDir)
            f"$q%-22s ${s.node}%-10s k=${s.scale}%-2d n=$n%-9d minMargin=$m%.3e"
          } else
            f"$q%-22s ${s.node}%-10s k=${s.scale}%-2d exact-operand (exempt)"
        }
      }
      info(s"${ledger.size} sites; transcendental margins all > 2 ulp:")
      ledger.foreach(info(_))
    }
  }
}
