package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column<->Expression bridging private[sql]
  * (classic.ExpressionUtils). This subpackage object re-exports the two
  * conversions graft's custom Catalyst expressions need — the standard
  * extension-library pattern (same trick frameless/delta use) and the only
  * place graft reaches into Spark internals. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
