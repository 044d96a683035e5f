package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared, driver-judged query: the Spark implementation and
  * (when SQL-expressible) its DuckDB oracle twin, kept in lockstep.
  *
  * Hash-match discipline (SURVEY.md §7.5) every query must follow:
  *   - never project raw `events.ts` (ns parquet vs µs Spark) — always
  *     `date_trunc` of second-or-coarser, identically in both engines;
  *   - double aggregates: sum via DECIMAL cast (exact, order-independent)
  *     then cast back to double, or `round(.., 2)` — same in both;
  *   - alias every computed column to the SAME name in both engines;
  *   - end with a total ORDER BY.
  */
final case class DeclaredQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object DeclaredQuery {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): DeclaredQuery =
    DeclaredQuery(name, fn, Some(oracle))

  /** Non-SQL-expressible (approx/randomized) op: rows-only check. */
  def noOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): DeclaredQuery =
    DeclaredQuery(name, fn, None)
}
