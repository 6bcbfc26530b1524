package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two float-array columns, accumulated in double.
  *
  * Replaces the `zip_with` + `aggregate` higher-order-function tree, which
  * evaluates an interpreted lambda per element — for the brute-force
  * exact-verification arms that score millions of candidate pairs, the
  * per-element Catalyst dispatch dominates. This is one tight O(dim) loop
  * per pair with the IDENTICAL floating-point sequence (per-element
  * double multiply, ordered accumulation), so results are bit-for-bit the
  * same as the higher-order form and hash-stable across engines. The
  * kernel is a static JVM method and `doGenCode` inlines a call to it, so
  * the expression stays INSIDE whole-stage codegen (no interpreted
  * fallback per row).
  */
object VectorMathImpl {
  def dot(va: ArrayData, vb: ArrayData): Double = {
    val n = math.min(va.numElements(), vb.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += va.getFloat(i).toDouble * vb.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMathImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMathImpl.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
  override def prettyName: String = "vector_dot"
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(new DotProduct(
      GraftShims.expression(a), GraftShims.expression(b)))
}
