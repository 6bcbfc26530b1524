package graft

import org.apache.spark.sql.types._

import graft.model.AvroSchemas

class AvroSchemaSpec extends SparkSuite {

  private val sample = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("active", BooleanType),
    StructField("born", DateType),
    StructField("ts", TimestampType),
    StructField("amount", DecimalType(10, 2)),
    StructField("payload", BinaryType),
    StructField("tags", ArrayType(StringType)),
    StructField("attrs", MapType(StringType, IntegerType)),
    StructField("nested", StructType(Seq(
      StructField("inner", IntegerType))))))

  test("spark -> avro -> spark round-trips types and nullability") {
    val avro = AvroSchemas.fromSpark(sample, "row")
    val back = AvroSchemas.toSpark(avro).asInstanceOf[StructType]
    assert(back.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq ==
      sample.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq)
  }

  test("avro enum/fixed/uuid map to string/binary with metadata") {
    val avroJson =
      """{"type":"record","name":"r","fields":[
        |{"name":"sev","type":{"type":"enum","name":"sevE","symbols":["LOW","HIGH"]}},
        |{"name":"hash","type":{"type":"fixed","name":"h16","size":16}},
        |{"name":"uid","type":{"type":"string","logicalType":"uuid"}},
        |{"name":"maybe","type":["null","int"],"default":null}]}""".stripMargin
    val parsed = new org.apache.avro.Schema.Parser().parse(avroJson)
    val spark = AvroSchemas.toSpark(parsed).asInstanceOf[StructType]
    assert(spark("sev").dataType == StringType)
    assert(spark("sev").metadata.getStringArray(AvroSchemas.EnumValuesKey)
      .toSeq == Seq("LOW", "HIGH"))
    assert(spark("hash").dataType == BinaryType)
    assert(spark("hash").metadata.getLong(AvroSchemas.FixedSizeKey) == 16)
    assert(spark("uid").metadata.getString(AvroSchemas.UuidKey) == "uuid")
    assert(spark("maybe").nullable && spark("maybe").dataType == IntegerType)
    // reverse keeps enum symbols and fixed size
    val back = AvroSchemas.fromSpark(spark, "r2")
    assert(back.getField("sev").schema().getEnumSymbols.size() == 2)
    assert(back.getField("hash").schema().getFixedSize == 16)
  }

  test("timestamp precision survives an avro round-trip") {
    val avroJson =
      """{"type":"record","name":"r","fields":[
        |{"name":"ts_ms","type":{"type":"long","logicalType":"timestamp-millis"}},
        |{"name":"ts_us","type":{"type":"long","logicalType":"timestamp-micros"}}]}""".stripMargin
    val parsed = new org.apache.avro.Schema.Parser().parse(avroJson)
    val sparkSchema = AvroSchemas.toSpark(parsed).asInstanceOf[StructType]
    assert(sparkSchema("ts_ms").dataType == TimestampType)
    assert(sparkSchema("ts_ms").metadata
      .getString(AvroSchemas.TimestampPrecisionKey) == "millis")
    // re-export keeps the ORIGINAL precision instead of widening to micros
    val back = AvroSchemas.fromSpark(sparkSchema, "r")
    assert(back.getField("ts_ms").schema()
      .getLogicalType.getName == "timestamp-millis")
    assert(back.getField("ts_us").schema()
      .getLogicalType.getName == "timestamp-micros")
  }

  test("uuid and fixed reach the iceberg schema as native types") {
    import graft.formats.iceberg.IcebergSchemas
    val avroJson =
      """{"type":"record","name":"r","fields":[
        |{"name":"uid","type":{"type":"string","logicalType":"uuid"}},
        |{"name":"hash","type":{"type":"fixed","name":"h16","size":16}},
        |{"name":"plain","type":"string"}]}""".stripMargin
    val sparkSchema = AvroSchemas.toSpark(
      new org.apache.avro.Schema.Parser().parse(avroJson))
      .asInstanceOf[StructType]
    val json = IcebergSchemas.toIcebergJson(
      IcebergSchemas.assignFieldIds(sparkSchema))
    assert(json.contains("\"uuid\""), json)
    assert(json.contains("\"fixed[16]\""), json)
    // round-trip: the metadata comes back so a re-export stays lossless
    val back = IcebergSchemas.fromIcebergJson(json)
    assert(back("uid").metadata.getString(AvroSchemas.UuidKey) == "uuid")
    assert(back("hash").metadata.getLong(AvroSchemas.FixedSizeKey) == 16L)
    assert(back("plain").dataType == StringType &&
      !back("plain").metadata.contains(AvroSchemas.UuidKey))
  }

  test("file groups roll up by partition") {
    import spark.implicits._
    import graft.model._
    val files = Seq(
      FileEntry("/d/p=1/a", 10, 5, "parquet",
        Seq(PartitionMember("p", "1")), Nil, 0),
      FileEntry("/d/p=1/b", 20, 7, "parquet",
        Seq(PartitionMember("p", "1")), Nil, 0),
      FileEntry("/d/p=2/c", 30, 11, "parquet",
        Seq(PartitionMember("p", "2")), Nil, 0)).toDS()
    val groups = graft.operators.FileGroups.byPartition(files).collect()
    assert(groups.length == 2)
    val g1 = groups.find(_.getString(0) == "p=1").get
    assert(g1.getLong(1) == 2 && g1.getLong(2) == 12 && g1.getLong(3) == 30)
  }
}
