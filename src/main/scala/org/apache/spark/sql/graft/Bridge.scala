package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Expression↔Column conversion `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This bridge lives in an
  * `org.apache.spark.sql` subpackage solely to re-expose those two calls to
  * the graft library — the standard extension-library workaround.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
