package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** The `nprobe` nearest centroids (by cosine) for a float-vector column —
  * the IVF assignment step, one tight O(nlist·dim) loop per row with the
  * centroid matrix riding as a codegen reference object (the expression
  * stays INSIDE whole-stage codegen).
  */
object NearestCentroidsImpl {
  def pick(vec: ArrayData, centroidsFlat: Array[Double], dim: Int,
      nprobe: Int): ArrayData = {
    val nlist = centroidsFlat.length / dim
    val n = math.min(dim, vec.numElements())
    val sims = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var dot = 0.0
      var d = 0
      while (d < n) { dot += vec.getFloat(d) * centroidsFlat(c * dim + d); d += 1 }
      sims(c) = dot          // centroids normalized → dot ∝ cosine
      c += 1
    }
    val picked = new Array[Int](math.min(nprobe, nlist))
    var p = 0
    while (p < picked.length) {
      var best = -1; var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < nlist) {
        if (sims(i) > bestSim) { best = i; bestSim = sims(i) }
        i += 1
      }
      picked(p) = best; sims(best) = Double.NegativeInfinity
      p += 1
    }
    new GenericArrayData(picked)
  }
}

case class NearestCentroids(
    child: Expression,
    centroidsFlat: Array[Double],   // nlist × dim row-major, L2-normalized
    dim: Int,
    nprobe: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NearestCentroidsImpl.pick(input.asInstanceOf[ArrayData], centroidsFlat,
      dim, nprobe)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val centRef =
      ctx.addReferenceObj("centroidsFlat", centroidsFlat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCentroidsImpl.pick($c, $centRef, $dim, $nprobe)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCentroids = copy(child = newChild)
  override def prettyName: String = "nearest_centroids"
}

object NearestCentroids {
  def apply(c: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val dim = centroids.head.length
    val normalized = centroids.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    GraftShims.column(new NearestCentroids(
      GraftShims.expression(c), normalized.flatten, dim, nprobe))
  }
}
