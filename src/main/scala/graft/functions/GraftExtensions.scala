package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's native expressions, so
  * `spark.sql("… dot_product(a, b) …")` works alongside the Column API.
  *
  * Two paths:
  *   - config injection: `.config("spark.sql.extensions",
  *     "graft.functions.GraftExtensions")` (or
  *     `builder.withExtensions(new GraftExtensions)`) registers at session
  *     build;
  *   - [[GraftFunctions.register]] adds the functions to an already-running
  *     session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(GraftFunctions.dotProductDescriptor)
}

object GraftFunctions {
  private[functions] val dotProductDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "dot_product expects exactly 2 arguments")
      DotProduct(exprs.head, exprs(1))
    })

  /** Register the engine functions into a live session. */
  def register(spark: SparkSession): Unit = {
    val (_, _, builder) = dotProductDescriptor
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("dot_product", builder, "built-in")
  }
}
