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

  /** True if the column's unanalyzed tree invokes a function whose text
    * rendering cannot serve as an injective memo-key component. Checked
    * on the ColumnNode tree because the classic Expression bridge is
    * lazy pre-analysis (`ColumnNodeExpression` hides the eventual
    * ScalaUDF). Deliberately CONSERVATIVE — a false positive costs the
    * caller an explicit key; a false negative is a silent handle swap:
    * - applied `functions.udf` (InvokeInlineUserDefinedFunction) and a
    *   raw ScalaUDF wrapped by this bridge (ExpressionColumnNode, whose
    *   Expression tree collect() does not descend into): anonymous
    *   lambdas all print `UDF(col)` — never injective;
    * - `call_function`/`call_udf` by name (UnresolvedFunction — Spark
    *   sets isUserDefinedFunction for ANY name here, builtins included;
    *   we cannot prove pre-analysis that the name is a stable builtin
    *   rather than a re-registerable session function, so refuse) and
    *   `expr("...")` (SqlExpression — the parsed text may call a
    *   session-registered name whose lambda can change between calls
    *   while the text stays identical).
    */
  def containsUdf(c: Column): Boolean =
    c.node.collect {
      case f: org.apache.spark.sql.internal.InvokeInlineUserDefinedFunction => f
      case f: org.apache.spark.sql.internal.UnresolvedFunction
          if f.isUserDefinedFunction => f
      case f: org.apache.spark.sql.internal.SqlExpression => f
      case e: org.apache.spark.sql.classic.ExpressionColumnNode
          if e.expression.exists {
            case _: org.apache.spark.sql.catalyst.expressions.ScalaUDF => true
            case _ => false
          } => e
    }.nonEmpty

  /** Runtime temp-function registration (functionRegistry is
    * `private[sql]` too).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
