package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> Expression converters that
  * Spark 4 hid behind `org.apache.spark.sql.classic`. Lives under the
  * `org.apache.spark.sql` package solely to satisfy the access modifier;
  * the rest of the engine goes through this one object.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
