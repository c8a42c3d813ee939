package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column↔Expression bridge `private[sql]`
  * (Connect-compatible facade); custom Catalyst expressions still need
  * it.  This shim lives in the `org.apache.spark.sql` package tree to
  * re-export the two conversions — the standard pattern for Spark
  * extension libraries. */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
