package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial hash over a string's UTF-8 bytes:
  * `h = Σ byte_i · B^(n-1-i)  (mod 2^61-1)`, B = 1000003.
  *
  * Document fingerprinting primitive (deterministic, order-sensitive —
  * unlike xxhash it supports incremental window updates, the property a
  * content-defined-chunking pipeline needs). Implemented as a native
  * Catalyst expression with codegen so it stays inside WholeStageCodegen
  * rather than falling out to a Scala UDF.
  */
object RollingHashImpl {
  final val Mod: Long = (1L << 61) - 1
  final val Base: Long = 1000003L

  /** (a*b) mod (2^61-1) without overflow, via 128-bit multiply. */
  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product into mod 2^61-1: (hi*2^64 + lo) mod M
    // 2^64 mod M = 8  (since 2^61 ≡ 1 → 2^64 ≡ 2^3)
    val folded = (hi % Mod) * 8 % Mod + ((lo >>> 61) + (lo & Mod)) % Mod
    val r = folded % Mod
    if (r < 0) r + Mod else r
  }

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (mulMod(h, Base) + (bytes(i) & 0xffL)) % Mod
      i += 1
    }
    h
  }
}

case class RollingHash(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    RollingHashImpl.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashImpl.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object GraftFunctions {
  import org.apache.spark.sql.GraftShims
  def rolling_hash(c: Column): Column =
    GraftShims.column(RollingHash(GraftShims.expression(c)))

  /** Register SQL-callable forms (rolling_hash) on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
}
