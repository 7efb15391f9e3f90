package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Spark 4 made Column ↔ Expression conversion private[sql]
 * (org.apache.spark.sql.classic.ExpressionUtils). Extensions that define
 * native Catalyst expressions need exactly these two conversions, so this
 * bridge re-exports them from inside the sql package namespace — the same
 * approach used by third-party Spark connector/extension libraries.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
