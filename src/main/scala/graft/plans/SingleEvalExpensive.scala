package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Expression, NamedExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DataType

/** Pass-through wrapper whose ONLY job is `deterministic = false`:
  * every predicate-pushdown pass (`PushPredicateThroughNonJoin`, in
  * whichever batch — the operator fixed point, AND SparkOptimizer's
  * later "Pushdown Filters from PartitionPruning" batch that re-runs
  * `PushDownPredicates` AFTER the Pre-CBO batch) refuses to substitute
  * a filter through a projection containing a non-deterministic
  * field, and `CollapseProject` refuses to inline one. The expression
  * IS deterministic in reality — the flag is the one plan-stability
  * contract Catalyst offers for "do not re-derive this" (same
  * mechanism that keeps `rand()` projections intact), applied by
  * [[SingleEvalExpensive]] to aliases it creates at the tail of
  * optimization, never user-visible.
  */
final case class OnceEvalBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "once_eval"
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OnceEvalBarrier =
    copy(child = newChild)
}

/** Pre-CBO optimizer rule: evaluate each EXPENSIVE scalar expression
  * at most once per row (SURVEY.md §2 J5; round-5 verdict #1).
  *
  * The defect class: `PushDownPredicates` pushes a filter through a
  * `Project` by substituting aliases with their defining expressions,
  * and `InferFiltersFromGenerate` manufactures `isnotnull(a) AND
  * size(a) > 0` filters that then get pushed the same way. Both are
  * correct and profitable for cheap expressions — but neither has a
  * cost model, so a projection like `winnow_fps(text) AS fps`
  * (a whole-document shingle+winnow scan, the most expensive scalar
  * in this engine) gets RE-DERIVED below its own projection, paying
  * the scan once per predicate occurrence on top of the projection's
  * own evaluation: 2–3× per row in the round-5 winnowing plans.
  *
  * The fix runs once, AFTER the operator-optimization fixed point
  * (`injectPreCBORule` — running inside the fixed point would fight
  * `PushDownPredicates` forever): any `Filter` whose condition
  * contains one of the engine's marked-expensive expressions is
  * rewritten so the expression is computed ONCE in a projection below
  * the filter and every consumer — the filter's predicates and the
  * parent projection alike — references the computed attribute:
  *
  * {{{
  *   Project [wf(text) AS fps]            Project [_we AS fps]
  *     Filter size(wf(text)) > 0    =>      Filter size(_we) > 0
  *       Scan [text]                          Project [text, wf(text) AS _we]
  *                                              Scan [text]
  * }}}
  *
  * The hoisted alias is wrapped in [[OnceEvalBarrier]]
  * (`deterministic = false`) because running after Pre-CBO is NOT
  * sufficient on its own: SparkOptimizer re-runs `PushDownPredicates`
  * in its "Pushdown Filters from PartitionPruning" batch after the
  * Pre-CBO batch (verified empirically — without the barrier the
  * hoisted filter was substituted straight back through the
  * projection). Cheap conjuncts are left below the barrier so they
  * still reach the scan. PlanSpec counts expensive-expression
  * occurrences in the final physical plan to pin the shape.
  *
  * Scale note: this is a pure constant-factor rule — it never changes
  * partitioning, shuffles, or row counts, only how many times a
  * per-row scan runs. At 100 TB the winnowing projection IS the
  * dominant cost of the passage-overlap pipeline, so a 3×→1× on that
  * stage is a 3× on the whole scan stage.
  */
object SingleEvalExpensive extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  /** The engine's marked-expensive scalars: whole-document scans and
    * model-applying encoders — everything whose per-row cost dwarfs a
    * hash or comparison. Generators (char_ngrams/token_ngrams) can't
    * appear in filter conditions and are deliberately absent.
    */
  private def isCostly(e: Expression): Boolean = e match {
    case _: graft.functions.WinnowFps => true
    case _: graft.functions.MinHashSig => true
    case _: graft.functions.SimHash64 => true
    case _: graft.functions.TokenNGramStats => true
    case _: graft.functions.PqEncode => true
    case _: graft.functions.PqAdcDist => true
    case _: graft.functions.LangIdScore => true
    case _: graft.functions.LmDocScore => true
    case _ => false
  }

  /** Maximal costly subexpressions of `e`, deduped semantically. */
  private def costlySubs(e: Expression): Seq[Expression] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Expression]
    def walk(x: Expression): Unit =
      if (isCostly(x)) { if (!out.exists(_.semanticEquals(x))) out += x }
      else x.children.foreach(walk)
    walk(e)
    out.toSeq
  }

  private def countIn(e: Expression, sub: Expression): Int = {
    var n = 0
    def walk(x: Expression): Unit =
      if (x.semanticEquals(sub)) n += 1 else x.children.foreach(walk)
    walk(e)
    n
  }

  private def replace(e: Expression, sub: Expression, attr: Attribute): Expression =
    e match {
      case x if x.semanticEquals(sub) => attr
      case x => x.mapChildren(replace(_, sub, attr))
    }

  /** Hoist `subs` into a barrier projection below the filter; rewrite
    * the costly conjuncts and the optional parent project list to
    * reference the hoisted attributes. Conjuncts NOT touching a
    * hoisted expression stay BELOW the barrier projection so cheap
    * predicates (`isnotnull(text)`) keep reaching the scan.
    */
  private def hoist(projList: Option[Seq[NamedExpression]], cond: Expression,
      child: LogicalPlan, subs: Seq[Expression])
      : (Option[Seq[NamedExpression]], Expression, LogicalPlan) = {
    val aliases = subs.map(s => Alias(OnceEvalBarrier(s), "_graft_once")())
    val attrs = aliases.map(_.toAttribute)
    val (costlyCjs, cheapCjs) = splitConjunctivePredicates(cond).partition(c =>
      subs.exists(s => countIn(c, s) >= 1))
    val below: LogicalPlan =
      if (cheapCjs.isEmpty) child else Filter(cheapCjs.reduce(And), child)
    val bottom = Project(child.output ++ aliases, below)
    // replace OUTERMOST subs first (round-13 review): two hoisted subs
    // can nest (a costly expression occurring standalone AND inside a
    // larger costly expression's other occurrence site); replacing the
    // inner one first would mutate the enclosing sub, turning its own
    // replacement into a silent no-op — the hoisted alias computes but
    // is never referenced, and the expensive expression keeps
    // re-deriving. Node-count-descending order rewrites a container
    // before anything it contains.
    val ordered = subs.zip(attrs)
      .sortBy { case (s, _) => -s.collect { case _ => () }.length }
    val newCond = costlyCjs.map(c =>
      ordered.foldLeft(c) { case (x, (s, a)) => replace(x, s, a) })
      .reduce(And)
    val newList = projList.map(_.map { ne =>
      ordered.foldLeft(ne: Expression) {
        case (x, (s, a)) => replace(x, s, a)
      }.asInstanceOf[NamedExpression]
    })
    (newList, newCond, bottom)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // Project over Filter: hoist when the filter's costly expression
    // is re-derived — either a second occurrence in the condition or
    // a recomputation in the projection itself.
    case p @ Project(pl, Filter(cond, child)) if costlySubs(cond).nonEmpty =>
      val subs = costlySubs(cond).filter { s =>
        s.deterministic && s.references.subsetOf(child.outputSet) &&
          (countIn(cond, s) >= 2 || pl.exists(countIn(_, s) >= 1))
      }
      if (subs.isEmpty) p
      else {
        val (newPlOpt, newCond, bottom) = hoist(Some(pl), cond, child, subs)
        Project(newPlOpt.get, Filter(newCond, bottom))
      }
    // Bare Filter: hoist only duplicated occurrences; restore the
    // schema with a pruning projection on top.
    case f @ Filter(cond, child) =>
      val subs = costlySubs(cond).filter(s =>
        s.deterministic && s.references.subsetOf(child.outputSet) &&
          countIn(cond, s) >= 2)
      if (subs.isEmpty) f
      else {
        val (_, newCond, bottom) = hoist(None, cond, child, subs)
        Project(child.output, Filter(newCond, bottom))
      }
  }
}
