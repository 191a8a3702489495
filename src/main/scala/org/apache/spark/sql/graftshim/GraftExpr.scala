package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between `Column` and catalyst `Expression` for code outside
  * the `org.apache.spark.sql` namespace (Spark 4 made the converters
  * `private[sql]`). Lets graft operators wrap custom native expressions
  * as Columns without registering them in the session function registry. */
object GraftExpr {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
