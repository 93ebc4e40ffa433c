package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column⇄Expression converters — the
  * standard pattern for libraries shipping custom Catalyst `Expression`s
  * (Spark 4 removed the public `Column(expr)` constructor). Lives in an
  * `org.apache.spark.sql` subpackage solely to satisfy the access
  * qualifier; nothing else belongs here. */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
