package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression conversion for SQL function registration
  * ([[graft.functions.GraftFunctions]]): the converters live in
  * `private[sql]` `classic.ExpressionUtils`, so this one-object bridge
  * sits in Spark's package to reach them — the standard technique for
  * third-party Catalyst extensions that expose Column-API composites
  * as SQL functions (the alternative, a UDF, would opt the expression
  * out of whole-stage codegen).
  */
object GraftColumnBridge {
  /** EAGER conversion via the full node-tree converter —
    * `ExpressionUtils.expression` wraps lazily in a
    * `ColumnNodeExpression` that only the plan-conversion path unwraps,
    * and a function-registry builder's output never passes through that
    * path (it surfaces verbatim at codegen time and dies Unevaluable).
    */
  def toExpr(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
  def toCol(e: Expression): Column = classic.ExpressionUtils.column(e)
}
