package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, DateDiff, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, If, LessThan, LessThanOrEqual, Literal, Not, Subtract, SubtractDates, SubtractTimestamps}
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
  * can expand the node, and covers the API's full surface:
  *
  *   - every `direction` (backward / forward / nearest), classified
  *     from the node's order expression (`lt − rt`, `rt − lt`, or the
  *     `If(lt > rt, …)` absolute-difference form) — the one field
  *     whose shape is direction-unambiguous;
  *   - `allowExactMatches` on and off (strict vs inclusive bounds,
  *     read from the as-of condition's base comparison; nearest reads
  *     the `NOT (lt = rt)` conjunct);
  *   - any `tolerance` (the full as-of condition — including its
  *     tolerance bounds — travels to the exec as an emit predicate;
  *     the merge candidate is boundary-nearest, so predicate-checking
  *     it alone is exact). The API's own non-negativity assertion is
  *     verified foldably here; a non-foldable assertion falls through.
  *
  * Still required: inner join type and a pure equi-conjunction `by`
  * condition with at least one key (the merge needs keys to cluster
  * on). Anything else (outer joins, non-equi conditions, key-less
  * joins) falls through untouched to Spark's rewrite — correct, just
  * not accelerated. Tie-break note: with duplicate right (key, time)
  * rows Spark's min_by keeps an arbitrary pair; the merge exec's
  * total right sort order makes its choice deterministic. Same for
  * equidistant nearest ties (merge picks backward; Spark arbitrary).
  * AsOfJoinSpec asserts parity with Spark's own rewrite on every
  * direction × exact × tolerance combination on tie-free data.
  */
object RewriteSparkAsOfJoin extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  /** The two operands of any "a minus b" form the analyzer can leave
    * in the order expression. `AsOfJoin.apply` builds a raw `Subtract`,
    * but the analyzer's `ResolveBinaryArithmetic` runs in the same
    * resolution batch and rewrites it by operand type BEFORE this
    * post-hoc rule sees the node: timestamp − timestamp →
    * `SubtractTimestamps`, date − date → `SubtractDates` (legacy
    * interval mode) or `DateDiff` (default). Matching only raw
    * `Subtract` silently dropped every timestamp/date-typed as-of join
    * — the most common shape — back to Spark's pair-expand rewrite
    * (round-5 advice); AsOfJoinSpec now pins TimestampType and
    * DateType routing.
    */
  private def diffSides(e: Expression): Option[(Expression, Expression)] = e match {
    case Subtract(a, b, _) => Some((a, b))
    case SubtractTimestamps(a, b, _, _) => Some((a, b))
    case SubtractDates(a, b, _) => Some((a, b))
    case DateDiff(end, start) => Some((end, start))
    case _ => None
  }

  /** (direction, leftTime, rightTime) from the node's order
    * expression — Spark builds `lt − rt` for backward, `rt − lt` for
    * forward, and `If(lt > rt, lt − rt, rt − lt)` for nearest (each
    * subtraction in whichever resolved form [[diffSides]] accepts).
    */
  private def classify(orderExpr: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(String, Expression, Expression)] = {
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (a.references.nonEmpty && a.references.subsetOf(l.outputSet) &&
        b.references.nonEmpty && b.references.subsetOf(r.outputSet)) Some((a, b))
      else None
    orderExpr match {
      case If(GreaterThan(_, _), d1, d2) if diffSides(d2).isDefined =>
        diffSides(d1).flatMap { case (x, y) =>
          sides(x, y).map { case (lt, rt) => ("nearest", lt, rt) } }
      case d =>
        diffSides(d).flatMap { case (a, b) =>
          sides(a, b).map { case (lt, rt) => ("backward", lt, rt) }
            .orElse(sides(b, a).map { case (lt, rt) => ("forward", lt, rt) })
        }
    }
  }

  /** allowExactMatches, read from the base comparison conjunct. */
  private def exactness(asOfCond: Expression, dir: String,
      lt: Expression, rt: Expression): Option[Boolean] = {
    val cs = splitConjunctivePredicates(asOfCond)
    def has(p: Expression => Boolean) = cs.exists(p)
    dir match {
      case "backward" =>
        if (has { case GreaterThanOrEqual(a, b) =>
          a.semanticEquals(lt) && b.semanticEquals(rt); case _ => false })
          Some(true)
        else if (has { case GreaterThan(a, b) =>
          a.semanticEquals(lt) && b.semanticEquals(rt); case _ => false })
          Some(false)
        else None
      case "forward" =>
        if (has { case LessThanOrEqual(a, b) =>
          a.semanticEquals(lt) && b.semanticEquals(rt); case _ => false })
          Some(true)
        else if (has { case LessThan(a, b) =>
          a.semanticEquals(lt) && b.semanticEquals(rt); case _ => false })
          Some(false)
        else None
      case _ => // nearest: exact unless the NOT(lt = rt) conjunct is present
        val nonExact = has {
          case Not(EqualTo(a, b)) =>
            (a.semanticEquals(lt) && b.semanticEquals(rt)) ||
              (a.semanticEquals(rt) && b.semanticEquals(lt))
          case _ => false
        }
        Some(!nonExact)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case j @ AsOfJoin(l, r, asOfCond, Some(cond), Inner, orderExpr, tolAssert)
          if j.resolved &&
            // batch inputs only (round-13 review): the merge exec is a
            // stateless per-micro-batch zipPartitions — intercepting a
            // STREAMING joinAsOf would silently drop cross-batch
            // matches, where falling through lets Spark's own rewrite
            // hit the UnsupportedOperationChecker and fail loudly
            !l.isStreaming && !r.isStreaming &&
            // the API's tolerance ≥ 0 assertion must hold provably
            tolAssert.forall(a => a.foldable && a.eval() == true) =>
        val keyPairs = splitConjunctivePredicates(cond).map {
          case EqualTo(a, b) if a.references.subsetOf(l.outputSet) &&
              b.references.subsetOf(r.outputSet) => Some((a, b))
          case EqualTo(a, b) if b.references.subsetOf(l.outputSet) &&
              a.references.subsetOf(r.outputSet) => Some((b, a))
          case _ => None
        }
        (if (keyPairs.nonEmpty && keyPairs.forall(_.isDefined))
          classify(orderExpr, l, r).flatMap { case (dir, lt, rt) =>
            exactness(asOfCond, dir, lt, rt).map { exact =>
              val (lk, rk) = keyPairs.flatten.unzip
              // a trivial condition (no tolerance, exact) needs no emit
              // predicate; keep the fast path predicate-free
              val needsPred = asOfCond match {
                case GreaterThanOrEqual(_, _) if dir == "backward" => false
                case Literal(true, _) if dir == "nearest" => false
                case LessThanOrEqual(_, _) if dir == "forward" => false
                case _ => true
              }
              AsOfJoinPlan(l, r, lk, rk, lt, rt, dir, exact,
                if (needsPred) Some(asOfCond) else None,
                if (dir == "nearest") Some(orderExpr) else None)
            }
          }.getOrElse(j)
        else j): LogicalPlan
    }
}
