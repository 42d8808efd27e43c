package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.graftnative.DotProduct

/** SparkSessionExtensions entry point — the deployment hook for this
  * library's native expressions on a cluster:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * makes `dot_product(array, array)` available to plain SQL everywhere
  * (the codegen expression, not a UDF). [[GraftExtensions.register]] does
  * the same for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
}

object GraftExtensions {
  private def builder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"dot_product expects 2 arguments, got ${args.length}")
    DotProduct(args.head, args(1))
  }

  private[graft] val dotProductDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    builder)

  /** Register the native functions into a live session. */
  def register(spark: SparkSession): Unit =
    ColumnBridge.registerTempFunction(spark, "dot_product", builder)
}
