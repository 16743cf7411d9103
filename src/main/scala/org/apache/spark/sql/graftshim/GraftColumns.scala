package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column↔Expression constructors (Column is
  * now connect/classic-agnostic); the classic bridge lives behind
  * `private[sql]`. This shim re-exports the two conversions the library
  * needs for its custom Catalyst expressions.
  */
object GraftColumns {
  def ofExpr(e: Expression): Column = ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = ExpressionUtils.expression(c)
}
