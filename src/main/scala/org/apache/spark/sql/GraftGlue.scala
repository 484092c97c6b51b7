package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's private[sql] Column↔Expression conversions, needed
  * to expose custom Catalyst expressions (e.g. graft.functions
  * .MinHashSig) as user-facing Columns on Spark 4's ColumnNode API. */
object GraftGlue {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = classic.ExpressionUtils.column(e)
}
