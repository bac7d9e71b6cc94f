package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) so custom Catalyst
  * expressions can surface as user-facing Columns. Standard extension
  * pattern: the package placement grants `private[sql]` access; no Spark
  * internals are modified.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `org.apache.spark.sql.types.AbstractDataType` is `private[sql]` at
  * the Scala level, so an expression outside the sql package cannot
  * write an `inputTypes: Seq[AbstractDataType]` override directly.
  * This alias (legal from inside the package) lets graft expressions
  * declare analysis-time input contracts — getting Catalyst's implicit
  * casts — without living inside Spark's namespace themselves.
  */
object TypeBridge {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
