package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Shared analysis-time checks for the PQ kernels: the vector child must
  * be array<float> (the kernels read via getFloat — an array<double>
  * column would silently read garbage otherwise) and eval guards the
  * length against m·dsub so a short vector fails with the cause, not an
  * ArrayIndexOutOfBounds deep in the loop.
  */
private[functions] object PqChecks {
  def requireFloatArray(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name needs an array<float> vector column, got ${other.sql} — " +
        "cast embeddings with col.cast(\"array<float>\")")
  }
  def requireLength(name: String, vec: ArrayData, expected: Int): Unit =
    if (vec.numElements() < expected)
      throw new IllegalArgumentException(
        s"$name: vector has ${vec.numElements()} elements, codebooks " +
          s"expect $expected (m·dsub)")
}

/** Product-quantization kernels (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search", public TPAMI paper / the FAISS IndexPQ
  * design). A vector is split into `m` subvectors of `dsub` dims; each
  * subvector is replaced by the index of its nearest sub-codebook centroid
  * — m bytes instead of dim×4, the compression that lets a 100 TB
  * embedding corpus be SCANNED from memory. Distances are then
  * approximated from per-query lookup tables in O(m) per pair instead of
  * O(dim), without ever touching the original vectors.
  *
  * All three kernels are native expressions (one tight loop per row, the
  * codebook matrix riding in the expression) — the PQ scan is the hot
  * path and an interpreted higher-order-function tree would dominate it.
  */

/** The PQ kernels as static JVM methods: `doGenCode` inlines calls to
  * them with the codebook riding as a codegen reference object, so every
  * kernel stays INSIDE whole-stage codegen.
  */
object PqImpl {
  def encode(vec: ArrayData, codebooksFlat: Array[Double], m: Int,
      dsub: Int, ksub: Int): ArrayData = {
    PqChecks.requireLength("pq_encode", vec, m * dsub)
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var dist = 0.0
        var d = 0
        while (d < dsub) {
          val diff = vec.getFloat(j * dsub + d).toDouble - codebooksFlat(base + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  def lut(vec: ArrayData, codebooksFlat: Array[Double], m: Int,
      dsub: Int, ksub: Int): ArrayData = {
    PqChecks.requireLength("pq_lut", vec, m * dsub)
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          acc += vec.getFloat(j * dsub + d).toDouble * codebooksFlat(base + d)
          d += 1
        }
        lut(j * ksub + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  def adc(lut: ArrayData, codes: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += lut.getDouble(j * ksub + codes.getInt(j))
      j += 1
    }
    acc
  }
}

/** Encode: per subspace j, the index of the L2-nearest sub-centroid.
  * codebooksFlat is m × ksub × dsub row-major.
  */
case class PqEncode(
    child: Expression,
    codebooksFlat: Array[Double],
    m: Int,
    dsub: Int,
    ksub: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    PqChecks.requireFloatArray(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any =
    PqImpl.encode(input.asInstanceOf[ArrayData], codebooksFlat, m, dsub, ksub)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooksFlat", codebooksFlat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqImpl.encode($c, $cb, $m, $dsub, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** Per-query ADC lookup table: lut[j*ksub + c] = dot(q_subⱼ, codebook[j][c]).
  * Built ONCE per query row (O(m·ksub·dsub) = O(dim·ksub)); every corpus
  * pair after that costs O(m).
  */
case class PqLut(
    child: Expression,
    codebooksFlat: Array[Double],
    m: Int,
    dsub: Int,
    ksub: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    PqChecks.requireFloatArray(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any =
    PqImpl.lut(input.asInstanceOf[ArrayData], codebooksFlat, m, dsub, ksub)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooksFlat", codebooksFlat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqImpl.lut($c, $cb, $m, $dsub, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
  override def prettyName: String = "pq_lut"
}

/** Asymmetric distance computation: approx dot(q, x) = Σⱼ lut[j·ksub +
  * codesⱼ]. O(m) per (query, corpus) pair — the PQ scan kernel.
  */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<double> lut, array<int> codes), " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqImpl.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PqImpl.adc($a, $b, $ksub)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdc = copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc"
}

object PqExpressions {
  /** codebooks: m × ksub sub-centroids of dsub dims each. */
  def encode(v: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val ksub = codebooks.head.length
    val dsub = codebooks.head.head.length
    GraftShims.column(new PqEncode(GraftShims.expression(v),
      codebooks.flatten.flatten, m, dsub, ksub))
  }

  def lut(q: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val ksub = codebooks.head.length
    val dsub = codebooks.head.head.length
    GraftShims.column(new PqLut(GraftShims.expression(q),
      codebooks.flatten.flatten, m, dsub, ksub))
  }

  def adc(lutCol: Column, codesCol: Column, ksub: Int): Column =
    GraftShims.column(new PqAdc(GraftShims.expression(lutCol),
      GraftShims.expression(codesCol), ksub))
}
