package graft.operators

import graft.plans.AsOfJoinPlan
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}

/** Public API for the native as-of join (SURVEY.md §2 C8, §4.3):
  *
  * {{{
  * AsOf.join(purchases, clicks,
  *   leftKeys  = Seq(purchases("user_id")),
  *   rightKeys = Seq(clicks("c_user_id")),
  *   leftTime  = purchases("sec"),
  *   rightTime = clicks("c_sec"))
  * }}}
  *
  * Inner as-of semantics: each left row pairs with the single right
  * row having equal keys and the greatest rightTime <= leftTime;
  * unmatched left rows are dropped, NULL keys/times never match.
  *
  * Columns must come from the argument DataFrames (`df("name")`), so
  * they carry resolved attribute references. The two sides must not
  * share attribute ids — derive them from separate projections (an
  * `.as(...)`-renamed select is enough, as aliasing mints fresh ids).
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column): DataFrame =
    GraftSqlBridge.ofRows(left.sparkSession, AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      leftKeys.map(GraftSqlBridge.expr), rightKeys.map(GraftSqlBridge.expr),
      GraftSqlBridge.expr(leftTime), GraftSqlBridge.expr(rightTime)))
}
