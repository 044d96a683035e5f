package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThanOrEqual}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{AsOfJoin, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Route Spark's OWN logical `AsOfJoin` node (built by
  * `Dataset.joinAsOf` / pandas-on-Spark `merge_asof`) to the native
  * merge operator (SURVEY.md §7.6.4).
  *
  * Without this rule those APIs hit the optimizer's `RewriteAsOfJoin`,
  * which expands every (left × candidate-right) pair through a full
  * condition join and then `min_by`s the pairs away — the blow-up
  * [[AsOfJoinPlan]] exists to avoid. The rule runs at analysis time
  * (post-hoc resolution), BEFORE the optimizer's Finish-Analysis batch
  * can expand the node, and rewrites exactly the shape the merge exec
  * implements:
  *
  *   - inner join, backward direction, exact matches allowed
  *     (`asOfCondition` = `leftTime >= rightTime`), no tolerance,
  *   - a pure equi-conjunction `by` condition with at least one key
  *     (the merge needs keys to cluster on).
  *
  * Everything else (outer/forward/nearest, tolerance, non-equi
  * conditions, key-less joins) falls through untouched to Spark's
  * rewrite — correct, just not accelerated. Tie-break note: with
  * duplicate right (key, time) rows Spark's min_by keeps an arbitrary
  * pair; the merge exec keeps the last row in its total right sort
  * order — both unspecified by the API, each deterministic per engine.
  */
object RewriteSparkAsOfJoin extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case j @ AsOfJoin(l, r, GreaterThanOrEqual(lt, rt), Some(cond), Inner, _, None)
          if j.resolved &&
            lt.references.subsetOf(l.outputSet) &&
            rt.references.subsetOf(r.outputSet) =>
        val keyPairs = conjuncts(cond).map {
          case EqualTo(a, b) if a.references.subsetOf(l.outputSet) &&
              b.references.subsetOf(r.outputSet) => Some((a, b))
          case EqualTo(a, b) if b.references.subsetOf(l.outputSet) &&
              a.references.subsetOf(r.outputSet) => Some((b, a))
          case _ => None
        }
        if (keyPairs.nonEmpty && keyPairs.forall(_.isDefined)) {
          val (lk, rk) = keyPairs.flatten.unzip
          AsOfJoinPlan(l, r, lk, rk, lt, rt)
        } else j
    }
}
