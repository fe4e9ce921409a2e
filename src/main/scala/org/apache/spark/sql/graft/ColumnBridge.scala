package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved the Column ↔ Catalyst-Expression bridge behind
  * `private[sql] ExpressionUtils`; connectors that define native
  * Catalyst expressions (codegen'd, no UDF overhead) need this shim in
  * the `org.apache.spark.sql` namespace to reach it. Only used by
  * graft.functions to expose expressions as user-facing Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** V2 literal factory: `LiteralValue`'s companion is `private[sql]`
    * in Spark 4; tests constructing runtime V2 predicates need it.
    */
  def v2Literal[T](value: T, dataType: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.connector.expressions.Literal[T] =
    org.apache.spark.sql.connector.expressions.LiteralValue(value, dataType)
}
