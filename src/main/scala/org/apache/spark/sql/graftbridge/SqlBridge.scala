package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark internals, placed under the
  * `org.apache.spark.sql` namespace — the standard pattern for extension
  * libraries that define native Catalyst expressions (the Column ⇄ Expression
  * converters moved behind `private[sql]` in Spark 4's unified Column API).
  * Keep this file to converters only; all engine logic lives in `graft.*`. */
object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
