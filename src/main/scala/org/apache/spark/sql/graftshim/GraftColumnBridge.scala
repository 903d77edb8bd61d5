package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal shim into Spark's `private[sql]` Column<->Expression bridge
 * (org.apache.spark.sql.classic.ExpressionUtils). Lives under
 * org.apache.spark.sql so the package-private members resolve; everything
 * graft-side goes through graft.internal.
 */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
