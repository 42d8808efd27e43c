package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 split Column from Expression (Connect support); the classic-mode
  * converters live behind `private[sql]`. This bridge re-exports exactly the
  * two conversions a library defining native Catalyst expressions needs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree into a real Catalyst expression
    * (UnresolvedFunction children and all). `expression` wraps the node in
    * an opaque lazy `ColumnNodeExpression`, which the analyzer cannot
    * traverse when the expression is returned from a FunctionRegistry
    * builder — SQL-registered functions built from Column DSL need this
    * converter instead.
    */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a temp SQL function backed by an expression builder into an
    * already-built session (the extensions path needs the function at
    * session construction; this one works on live sessions, e.g. tests).
    */
  def registerTempFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
