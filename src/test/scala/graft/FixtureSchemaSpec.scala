package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.formats.delta._
import graft.formats.iceberg._
import graft.sources.ParquetDirectorySource
import graft.sync.TableFormatSync

/** The reference's standard 17-field fixture schema (FIXTURES.md §1,
  * TestDeltaHelper.java:75-112) pushed through the conversion chain —
  * nested structs/maps/arrays, binary, date/timestamp must survive.
  */
class FixtureSchemaSpec extends SparkSuite {

  private val fixtureSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("firstName", StringType),
    StructField("gender", StringType),
    StructField("birthDate", TimestampType, nullable = false),
    StructField("level", StringType, nullable = false),
    StructField("boolean_field", BooleanType),
    StructField("date_field", DateType),
    StructField("double_field", DoubleType),
    StructField("float_field", FloatType),
    StructField("long_field", LongType),
    StructField("binary_field", BinaryType),
    StructField("simple_map", MapType(StringType, IntegerType)),
    StructField("primitive_list", ArrayType(IntegerType)),
    StructField("record_list", ArrayType(StructType(Seq(
      StructField("nested_int", IntegerType))))),
    StructField("record_field", StructType(Seq(
      StructField("nested_int", IntegerType))))))

  private def fixtureRows(n: Int): Seq[Row] = (0 until n).map { i =>
    Row(i, s"name$i", if (i % 2 == 0) "M" else "F",
      new Timestamp(1600000000000L + i * 1000L),
      Seq("INFO", "WARN", "ERROR")(i % 3),
      i % 2 == 0, Date.valueOf("2020-01-01"),
      i * 1.5, i * 0.5f, i.toLong * 100,
      Array[Byte](1, 2, i.toByte),
      Map("k" -> i), Seq(i, i + 1),
      Seq(Row(i)), Row(i * 10))
  }

  test("17-field fixture schema survives parquet -> delta -> iceberg") {
    import scala.jdk.CollectionConverters._
    val dataDir = tmpDir("fix_data")
    val deltaDir = tmpDir("fix_delta")
    val iceDir = tmpDir("fix_ice")
    val df = spark.createDataFrame(fixtureRows(100).asJava, fixtureSchema)
    df.coalesce(1).write.mode("overwrite").parquet(dataDir)

    val src = new ParquetDirectorySource(spark, dataDir, "fixture")
    val r1 = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, deltaDir)),
      src.currentSnapshot(), src.sourceFormat)
    assert(r1.forall(_.status == "SUCCESS"), r1.mkString(";"))

    val deltaSrc = new DeltaConversionSource(spark, deltaDir, "fixture")
    val r2 = TableFormatSync.syncSnapshot(
      Seq(new IcebergConversionTarget(spark, iceDir)),
      deltaSrc.currentSnapshot(), deltaSrc.sourceFormat)
    assert(r2.forall(_.status == "SUCCESS"), r2.mkString(";"))

    val back = new IcebergConversionSource(spark, iceDir, "fixture").toDataFrame
    // row-identical read-back: the reference's own oracle
    // (ITConversionController.java:950-1027 sorts and compares JSON rows)
    val a = back.orderBy("id").toJSON.collect().toSeq
    val b = spark.read.parquet(dataDir).orderBy("id").toJSON.collect().toSeq
    assert(a == b)
    // nested list/map/struct types round-tripped through both schema codecs
    val iceSchema = new IcebergConversionSource(spark, iceDir, "fixture")
      .currentTable().schema
    assert(iceSchema("simple_map").dataType.isInstanceOf[MapType])
    assert(iceSchema("record_list").dataType.isInstanceOf[ArrayType])
    assert(iceSchema("record_field").dataType.isInstanceOf[StructType])
  }
}
