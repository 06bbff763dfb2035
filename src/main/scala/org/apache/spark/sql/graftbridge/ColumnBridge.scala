package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst-Expression bridge. Spark 4 gates
  * `ExpressionUtils` behind `private[sql]`, so a library shipping
  * native `Expression`s (graft.functions.CosineSim) needs this one
  * accessor compiled inside the `org.apache.spark.sql` namespace — the
  * established pattern for Catalyst extension libraries; nothing else
  * in the repo lives outside the `graft` namespace. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
