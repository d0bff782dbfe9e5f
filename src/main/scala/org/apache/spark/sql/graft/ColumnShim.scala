package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column ↔ Expression
  * converters, for the few places the engine must attach a custom
  * Catalyst expression that SQL function registration cannot express —
  * e.g. [[graft.functions.BloomMightContainBC]], which carries a
  * `Broadcast` handle (a runtime object, not a SQL argument). Only the
  * two converters are exposed; everything else stays on the public
  * DataFrame API. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
