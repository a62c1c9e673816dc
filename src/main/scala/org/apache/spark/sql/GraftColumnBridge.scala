package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters so graft
  * can expose custom Catalyst expressions (e.g. graft.functions.VectorDot)
  * as ordinary `Column`s. This is the standard extension seam for
  * libraries shipping native expressions on Spark 4's ColumnNode API. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager ColumnNode → catalyst Expression conversion. Required when an
    * expression is handed to the FunctionRegistry: the lazy wrapper from
    * `expression` stays a ColumnNode shim that analysis won't unwrap
    * inside SQL function resolution ("Cannot generate code for
    * columnnodeexpression"). */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
