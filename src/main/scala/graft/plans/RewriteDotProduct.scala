package graft.plans

import graft.functions.DotProductF
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule (SURVEY.md §2 J5, §4.3): rewrites the composable
  * higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *               0D, (acc, v) -> acc + v) }}}
  *
  * over two `array<float>` columns into the codegen'd
  * [[graft.functions.DotProductF]]. Higher-order functions evaluate
  * interpreted in Spark (a lambda frame per element, no whole-stage
  * codegen) — measured ~20× slower on similarity-join hot paths — so
  * a user who writes the idiomatic declarative form gets the fast
  * expression automatically.
  *
  * The rewrite is exact: DotProductF accumulates left-to-right in
  * double, the same IEEE sequence as this fold (double multiply and
  * add are commutative per element, so operand order inside the
  * lambdas is irrelevant). It fires ONLY on the double-cast shape —
  * the plain-float-multiply form `(x, y) -> x * y` rounds each
  * product to float and is deliberately left alone.
  *
  * The rewrite is semantics-preserving on malformed input too:
  * mismatched array lengths yield NULL through zip_with's null
  * padding (null element poisons the fold), so the rewritten form is
  * `If(size(l) = size(r), DotProductF(l, r), NULL)` — bare
  * DotProductF would throw where the original query returned NULL,
  * and an optimizer rule injected for every session must never turn
  * a NULL-producing query into a failed job. Because the guard
  * DUPLICATES l and r, the rewrite fires only on CHEAP inputs
  * (attributes / literals / struct-field reads): for a computed
  * array (e.g. `slice(a, 1, 128)`) the duplicated occurrence would
  * materialize the array twice per row — subexpression elimination
  * does not merge an If-condition occurrence with a branch occurrence
  * — costing more than the HOF it replaces saves (round-13 review).
  * On cheap inputs the guard is two codegen'd length reads,
  * branch-predicted away on well-formed data.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedExpression): Boolean = (e, v) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _ => false
  }

  /** The multiply body must be CAST(x AS DOUBLE) * CAST(y AS DOUBLE)
    * with {x, y} exactly the zip_with lambda variables (either order).
    */
  private def isDoubleCastMultiply(body: Expression,
      x: NamedExpression, y: NamedExpression): Boolean = body match {
    case Multiply(Cast(a, DoubleType, _, _), Cast(b, DoubleType, _, _), _) =>
      (sameVar(a, x) && sameVar(b, y)) || (sameVar(a, y) && sameVar(b, x))
    case _ => false
  }

  /** Null-element safety: the HOF fold yields NULL when any element is
    * NULL (null product poisons the sum), but ArrayData.getFloat reads
    * a null slot as 0.0 — rewriting a containsNull array would turn
    * NULL into a finite wrong number. Only provably null-free arrays
    * (containsNull=false) are eligible.
    */
  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, containsNull) => !containsNull
    case _ => false
  }

  /** Inputs cheap enough to duplicate into the Size guard (class doc). */
  private def isCheap(e: Expression): Boolean = e match {
    case _: Attribute | _: Literal => true
    case g: GetStructField => isCheap(g.child)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, LambdaFunction(mult,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), false)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(accRef, vRef, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), false),
            LambdaFunction(finBody, Seq(fin: NamedLambdaVariable), false))
          if isFloatArray(l) && isFloatArray(r) &&
            // the rewrite duplicates l and r into the Size guard: a
            // nondeterministic array would be evaluated independently
            // there and in DotProductF, guarding a DIFFERENT value
            // than the one dotted — only rewrite deterministic inputs,
            // and only CHEAP ones (duplication cost — class doc)
            l.deterministic && r.deterministic &&
            isCheap(l) && isCheap(r) &&
            isDoubleCastMultiply(mult, x, y) &&
            ((sameVar(accRef, acc) && sameVar(vRef, v)) ||
              (sameVar(accRef, v) && sameVar(vRef, acc))) &&
            sameVar(finBody, fin) =>
        // Size(legacySizeOfNull = false) is NULL on a NULL array, so a
        // NULL input short-circuits the If predicate to the NULL branch
        // — same result as the fold it replaces.
        If(EqualTo(Size(l, legacySizeOfNull = false),
            Size(r, legacySizeOfNull = false)),
          DotProductF(l, r),
          Literal(null, DoubleType))
    }
}
