package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Repartition, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** AQE runtime-optimizer rule (round 10, VERDICT r9 task #3b): a
  * query's final deterministic ORDER BY plans as
  * `Exchange rangepartitioning(...)` — and a RangePartitioner pays a
  * SEPARATE range-sampling job over the child before the real shuffle
  * even starts. For the analytics-result shape (a grouped/limited
  * output of KBs–MBs) that sampling job plus the 32-partition exchange
  * is pure fixed cost: a single-partition exchange plus one in-task
  * sort produces the identical total order with one fewer job and one
  * fewer sort-merge fan-in. Measured per query at sf0.1
  * (tools/SortCostProf, warm min): q_date_funcs 0.325→0.226 s,
  * q_events_hourly 0.265→0.172 s, q_docs_by_lang 0.212→0.176 s.
  *
  * Scale safety is the whole point of doing this at RUNTIME: the rule
  * is injected via `injectRuntimeOptimizerRule`, so it only runs
  * inside AQE re-optimization, where the sort's child subtree bottoms
  * out in materialized query stages carrying REAL runtime sizes. The
  * rewrite fires only when the child's estimated size is ≤ the
  * threshold (default 16 MB) — a 100 TB final sort keeps its range
  * exchange and full parallelism; a dashboard-sized result stops
  * paying cluster-coordination tax. (A compile-time version of this
  * rule would have to trust pre-execution guesses; the AQE hook makes
  * the decision with the penultimate stage's actual bytes.)
  *
  * Only the FINAL sort is eligible — the topmost global Sort reachable
  * from the root through Project / coalesce nodes. A global sort under
  * GlobalLimit never reaches here (the planner fuses it into
  * TakeOrderedAndProject before AQE), and mid-plan sorts keep their
  * distribution. The rewrite `Sort(global) → Sort(local) ∘
  * Repartition(1, shuffle=true)` preserves the total order exactly:
  * all rows land in one partition and are sorted by the same keys.
  *
  * Off-switch: `spark.graft.smallSortSinglePartition=false`;
  * threshold: `spark.graft.smallSortSinglePartition.maxBytes`.
  */
object SmallSortSinglePartition extends Rule[LogicalPlan] {

  private def maxBytes: Long =
    conf.getConfString("spark.graft.smallSortSinglePartition.maxBytes",
      (16L << 20).toString).toLong

  private def enabled: Boolean =
    conf.getConfString("spark.graft.smallSortSinglePartition", "true").toBoolean

  /** Descend from the root through order-preserving wrappers only. */
  private def rewriteChain(p: LogicalPlan): LogicalPlan = p match {
    case pr: Project => pr.copy(child = rewriteChain(pr.child))
    case rp: Repartition if !rp.shuffle =>
      rp.copy(child = rewriteChain(rp.child))
    case s: Sort if s.global && s.child.stats.sizeInBytes <= maxBytes =>
      s.copy(global = false,
        child = Repartition(1, shuffle = true, s.child))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (enabled) rewriteChain(plan) else plan
}
