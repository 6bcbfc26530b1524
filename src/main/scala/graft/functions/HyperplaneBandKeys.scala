package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All LSH band keys for an embedding in one pass: `bands × rowsPerBand`
  * hyperplane dot products, sign bits packed per band.
  *
  * Replaces a 32-plane × 64-literal `zip_with`/`aggregate` expression tree
  * (which evaluated thousands of Catalyst nodes per row — 44 s for 2 k
  * vectors at sf0.1) with one tight O(planes·dim) loop per row (~1 s).
  * The plane matrix rides as a codegen reference object, so the
  * expression stays INSIDE whole-stage codegen.
  */
object HyperplaneImpl {
  def bandKeys(vec: ArrayData, planesFlat: Array[Double], dim: Int,
      bands: Int, rowsPerBand: Int): ArrayData = {
    val n = math.min(dim, vec.numElements())
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < rowsPerBand) {
        val plane = (b * rowsPerBand + r) * dim
        var dot = 0.0
        var d = 0
        while (d < n) {
          dot += vec.getFloat(d) * planesFlat(plane + d)
          d += 1
        }
        if (dot >= 0) key |= (1L << r)
        r += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }
}

case class HyperplaneBandKeys(
    child: Expression,
    planesFlat: Array[Double],        // planes × dim, row-major
    dim: Int,
    bands: Int,
    rowsPerBand: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HyperplaneImpl.bandKeys(input.asInstanceOf[ArrayData], planesFlat, dim,
      bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planesFlat", planesFlat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneImpl.bandKeys($c, $planesRef, $dim, " +
        s"$bands, $rowsPerBand)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HyperplaneBandKeys = copy(child = newChild)
  override def prettyName: String = "hyperplane_band_keys"
}

object HyperplaneBandKeys {
  def apply(c: Column, planes: Array[Array[Double]], bands: Int,
      rowsPerBand: Int): Column = {
    val dim = planes.head.length
    GraftShims.column(new HyperplaneBandKeys(GraftShims.expression(c),
      planes.flatten, dim, bands, rowsPerBand))
  }
}
