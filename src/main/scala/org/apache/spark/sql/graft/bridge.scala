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

  /** True if the column's unanalyzed tree invokes a user-defined
    * function — the nodes whose text rendering is NOT injective (two
    * different lambdas both print `UDF(col)`), so they cannot serve as
    * memo-key components. Checked on the ColumnNode tree because the
    * classic Expression bridge is lazy pre-analysis
    * (`ColumnNodeExpression` hides the eventual ScalaUDF). Three UDF
    * routes exist and all must match: an applied `functions.udf`
    * (InvokeInlineUserDefinedFunction), a registered function called by
    * name via `expr("f(x)")` (UnresolvedFunction with the UDF flag),
    * and a raw Catalyst expression wrapped by the bridge itself
    * (ExpressionColumnNode — collect() does not descend into it, so its
    * Expression tree is walked directly).
    */
  def containsUdf(c: Column): Boolean =
    c.node.collect {
      case f: org.apache.spark.sql.internal.InvokeInlineUserDefinedFunction => f
      case f: org.apache.spark.sql.internal.UnresolvedFunction
          if f.isUserDefinedFunction => f
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
