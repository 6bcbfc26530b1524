package graft

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.formats.delta.DeltaStats
import graft.formats.iceberg.IcebergValues
import graft.model.{FileColumnStat, StatCodec}

/** Round-trip laws for the value codecs (SURVEY §5: "ScalaCheck property
  * tests for schema/value codecs: fromX(toX(s)) == s"). Generators are
  * driven with a fixed seed so failures reproduce.
  */
class CodecPropertySpec extends SparkSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private val genLong = Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
  private val genInt = Gen.chooseNum(Int.MinValue, Int.MaxValue)
  private val genDouble = Gen.oneOf(
    Gen.chooseNum(-1e12, 1e12), Gen.const(Double.NaN),
    Gen.const(Double.PositiveInfinity), Gen.const(Double.NegativeInfinity))
  private val genMicros = Gen.chooseNum(-62135596800000000L, 253402300799000000L)
  private val genEpochDay = Gen.chooseNum(-700000L, 2900000L)

  test("canonical stat strings round-trip through Iceberg binary bounds") {
    forAll(genLong) { v =>
      assert(IcebergValues.fromBytes(
        IcebergValues.toBytes(v.toString, LongType), LongType) == v.toString)
    }
    forAll(genInt) { v =>
      assert(IcebergValues.fromBytes(
        IcebergValues.toBytes(v.toString, IntegerType), IntegerType) == v.toString)
    }
    forAll(genMicros) { us =>
      assert(IcebergValues.fromBytes(
        IcebergValues.toBytes(us.toString, TimestampType), TimestampType)
        == us.toString)
    }
    forAll(genEpochDay) { d =>
      val iso = java.time.LocalDate.ofEpochDay(d).toString
      assert(IcebergValues.fromBytes(
        IcebergValues.toBytes(iso, DateType), DateType) == iso)
    }
    forAll(Gen.alphaNumStr) { s =>
      assert(IcebergValues.fromBytes(
        IcebergValues.toBytes(s, StringType), StringType) == s)
    }
  }

  test("double stats survive Delta stats JSON incl. NaN and infinities") {
    val schema = StructType(Seq(StructField("x", DoubleType)))
    forAll(genDouble, genDouble) { (mn, mx) =>
      val in = Seq(FileColumnStat("x",
        Some(mn.toString), Some(mx.toString), 1L, 10L, 0L))
      val (n, out) = DeltaStats.parse(schema, DeltaStats.toJson(schema, 10L, in))
      assert(n == 10L)
      val s = out.find(_.field == "x").get
      def same(a: String, b: String) = {
        val (x, y) = (a.toDouble, b.toDouble)
        (x.isNaN && y.isNaN) || x == y
      }
      assert(same(s.min.get, mn.toString) && same(s.max.get, mx.toString))
    }
  }

  test("timestamp stats survive Delta stats JSON to the microsecond") {
    val schema = StructType(Seq(StructField("t", TimestampType)))
    forAll(Gen.chooseNum(0L, 4102444800000000L)) { us =>
      val in = Seq(FileColumnStat("t", Some(us.toString), Some(us.toString),
        0L, 1L, 0L))
      val (_, out) = DeltaStats.parse(schema, DeltaStats.toJson(schema, 1L, in))
      assert(out.head.min.get.toLong == us)
    }
  }

  test("StatCodec ordering agrees with typed ordering") {
    forAll(genLong, genLong) { (a, b) =>
      assert(StatCodec.lt(a.toString, b.toString, LongType) == (a < b))
    }
    forAll(genMicros, genMicros) { (a, b) =>
      assert(StatCodec.lt(a.toString, b.toString, TimestampType) == (a < b))
    }
    forAll(Gen.chooseNum(-1e9, 1e9), Gen.chooseNum(-1e9, 1e9)) {
      (a: Double, b: Double) =>
        assert(StatCodec.lt(a.toString, b.toString, DoubleType) == (a < b))
    }
  }

  test("fromDeltaUri(toDeltaUri) is identity for filesystem paths") {
    // PROTOCOL.md action paths: every path a writer can produce must
    // survive the encode→decode round trip — spaces, percents, plus,
    // unicode, hive `col=value` segments
    val genSegment = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '%', '+', '-', '_', '.', '=', 'é',
        '日', '&', '(', ')', '#'))).map(_.mkString)
    val genPath = Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, genSegment).map(_.mkString("/")))
    forAll(genPath) { p =>
      val enc = graft.util.PathUtils.toDeltaUri(p)
      assert(graft.util.PathUtils.fromDeltaUri(enc) == p,
        s"'$p' -> '$enc' -> '${graft.util.PathUtils.fromDeltaUri(enc)}'")
      // the encoded form is scheme-less and never contains a raw space
      assert(!enc.contains(' '), enc)
    }
  }

  test("decode(encode) is identity for typed values") {
    forAll(genEpochDay) { d =>
      val date = java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d).toString)
      val enc = StatCodec.encode(date, DateType).get
      assert(StatCodec.decode(enc, DateType) == date)
    }
    forAll(genLong) { v =>
      assert(StatCodec.decode(
        StatCodec.encode(v, LongType).get, LongType) == v)
    }
  }
}
