package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column an engine-agnostic wrapper (ColumnNode); converting
  * between Column and a Catalyst Expression goes through
  * `sql.classic.ExpressionUtils`, which is `private[sql]`. This bridge lives
  * in the sql namespace solely to re-export those two conversions for the
  * engine's custom expressions (e.g. [[graft.functions.DotProduct]]).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
