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
  * padding (null element poisons the fold), so the rewrite emits
  * `DotProductF(l, r, nullOnMismatch = true)` — the expression's own
  * length check returns NULL in that mode, exactly the fold's answer,
  * where the direct `vec_dot` surface keeps its loud data-error
  * throw. Round-13 review: the earlier `If(size(l) = size(r), …)`
  * guard DUPLICATED both operands, materializing a computed array
  * (e.g. `slice(a, …)`, or a projection inlined by CollapseProject)
  * twice per row — subexpression elimination does not merge an
  * If-condition occurrence with a branch occurrence. Folding the
  * check into the expression evaluates each operand exactly once,
  * which also makes the rewrite safe for nondeterministic inputs.
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
            isDoubleCastMultiply(mult, x, y) &&
            ((sameVar(accRef, acc) && sameVar(vRef, v)) ||
              (sameVar(accRef, v) && sameVar(vRef, acc))) &&
            sameVar(finBody, fin) =>
        // single evaluation of each operand; NULL array → NULL (the
        // expression is null-safe), mismatched lengths → NULL via the
        // nullOnMismatch mode — both exactly the fold's semantics
        DotProductF(l, r, nullOnMismatch = true)
    }
}
