package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 moved the classic `Column(expr)` constructor behind
  * `private[sql] ExpressionUtils`; libraries adding native Catalyst
  * expressions conventionally reach it from a file in the
  * `org.apache.spark.sql` package namespace (same technique used by
  * Delta/Sedona/etc. against the public Spark source).
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True if the column's unanalyzed tree invokes an inline user-defined
    * function — the node whose text rendering is NOT injective (two
    * different lambdas both print `UDF(col)`), so it cannot serve as a
    * memo-key component. Checked on the ColumnNode tree because the
    * classic Expression bridge is lazy pre-analysis
    * (`ColumnNodeExpression` hides the eventual ScalaUDF).
    */
  def containsUdf(c: Column): Boolean =
    c.node.collect {
      case f: org.apache.spark.sql.internal.InvokeInlineUserDefinedFunction => f
    }.nonEmpty

  /** Runtime temp-function registration (functionRegistry is
    * `private[sql]` too).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
