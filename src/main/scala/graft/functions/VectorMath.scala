package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * same as the higher-order form and hash-stable across engines.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val n = math.min(va.numElements(), vb.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += va.getFloat(i).toDouble * vb.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
  override def prettyName: String = "vector_dot"
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(new DotProduct(
      GraftShims.expression(a), GraftShims.expression(b)))
}
