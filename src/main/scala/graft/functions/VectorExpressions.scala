package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product of two `array<double>` columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are evaluated
  * interpreted — per-element lambda dispatch plus an intermediate array
  * allocation per row — which dominates wall-clock when scoring millions of
  * vector pairs. This expression is a single primitive `while` loop over
  * `ArrayData` in both the interpreted path and the generated code, keeping
  * pairwise scoring inside whole-stage codegen (SURVEY §4: custom
  * `Expression` preferred over UDFs).
  *
  * Returns NULL if either side is NULL; throws on a dimension mismatch —
  * silently iterating a common prefix would quietly score (and bucket)
  * vectors on a truncated subspace, a recall loss with no error anywhere.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = DotProduct.checkDims(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = graft.functions.DotProduct.checkDims($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Shared by the interpreted and generated paths (must be public static
    * for codegen'd classes to call it). */
  def checkDims(a: Int, b: Int): Int = {
    if (a != b)
      throw new IllegalArgumentException(s"dot_product: dimension mismatch ($a vs $b)")
    a
  }
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `dot_product(a, b)` as a Column (arrays must be `array<double>`). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
