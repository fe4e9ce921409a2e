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

  /** Register a session-scoped SQL function backed by a Catalyst
    * expression BUILDER (not a UDF): the builder composes the argument
    * expressions into the same codegen'd tree the Column API builds, so
    * `SELECT quality_score(text)` plans identically to
    * `select(qualityScore(col("text")))` — whole-stage codegen, no
    * serialization wall. Session-scoped like a temp view;
    * `sessionState.functionRegistry` is `private[sql]`, hence this shim.
    */
  def registerExpressionFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Column] => Column): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      // the session's converter EAGERLY lowers the composed Column tree
      // to Catalyst expressions (ExpressionUtils.expression would wrap
      // it in a lazy ColumnNodeExpression, which is Unevaluable when
      // spliced into an already-analyzed tree)
      exprs => classic.expression(builder(exprs.map(ExpressionUtils.column))),
      "scala_udf")
  }
}
