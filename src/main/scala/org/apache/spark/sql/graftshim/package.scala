package org.apache.spark.sql

/** Bridge to `private[sql]` Column↔Expression converters (Spark 4
  * moved them behind `org.apache.spark.sql.classic.ExpressionUtils`).
  * Lives in the spark.sql package solely to satisfy the access
  * qualifier; the public surface for engine code is
  * [[graft.functions.VectorFunctions]].
  */
package object graftshim {
  import org.apache.spark.sql.catalyst.expressions.Expression

  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
