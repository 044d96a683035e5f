package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact money aggregation in primitive codegen (SURVEY.md §7.5 float
  * discipline, round-7 fast path): numerically identical to the
  * decimal-cast discipline
  *
  *   CAST(sum(CAST(x AS DECIMAL(_, s))) AS DOUBLE)
  *
  * but ~1.8× faster (tools/PricingProf: decimal 0.92 s vs scaled-long
  * 0.50 s on the flagship at sf0.1), because Spark's decimal sums add
  * Decimal objects while this form sums primitive longs inside
  * whole-stage codegen.
  *
  * Mechanics: each row's product rounds once to the oracle's decimal
  * scale — `round(x·10^s)` ≡ `CAST(x AS DECIMAL(_, s))`, both HALF_UP
  * on the same double — then the scaled integer splits into whole
  * units (`div`) and sub-unit remainder (`%`), each summed as a plain
  * long. Per-group overflow bound ≥ 8·10¹³ rows at s=4 (vs ~8·10⁹
  * unsplit), and ANSI mode turns any violation into a loud error,
  * never a silent wrap. The exact total reassembles in DECIMAL(38)
  * space; the decimal division by 10^s is exact (the quotient has ≤ s
  * decimals), so the single double rounding happens at the very end —
  * the same one rounding the oracle performs. Bit-parity with the
  * decimal form is pinned in EdgeCaseSpec and by every consumer's
  * DuckDB value gate.
  */
object ExactSum {

  /** `≡ CAST(sum(CAST((xSql) AS DECIMAL(_, s))) AS DOUBLE)` where
    * `scale` = 10^s. `xSql` is a raw SQL expression over the input
    * columns (it is inlined twice, into the div and mod branches —
    * cheap codegen arithmetic, and Catalyst's common-subexpression
    * elimination shares the rounded product).
    */
  def moneySum(xSql: String, scale: Long): Column = {
    val scaled = s"CAST(round(($xSql) * $scale, 0) AS BIGINT)"
    ((sum(expr(s"$scaled div $scale")).cast("decimal(38,0)") * lit(scale) +
      sum(expr(s"$scaled % $scale"))) / lit(scale)).cast("double")
  }
}
