package graft

import org.apache.spark.sql.types._

import graft.formats.delta.DeltaPartitions
import graft.formats.iceberg.IcebergValues
import graft.model._

class PartitionTransformSpec extends SparkSuite {

  test("partition spec DSL round-trips") {
    val specs = PartitionSpecDSL.parse("ts:DAY:yyyy-MM-dd,region:VALUE,user_id:BUCKET:16")
    assert(specs == Seq(
      PartitionFieldSpec("ts", Transform.Day, format = Some("yyyy-MM-dd")),
      PartitionFieldSpec("region", Transform.Value),
      PartitionFieldSpec("user_id", Transform.Bucket, numBuckets = Some(16))))
    assert(PartitionSpecDSL.parse(PartitionSpecDSL.format(specs)) == specs)
    intercept[IllegalArgumentException](PartitionSpecDSL.parse("x:NOPE"))
  }

  test("delta generation expressions round-trip the reference grammar") {
    val cases = Seq(
      PartitionFieldSpec("ts", Transform.Year) -> "YEAR(ts)",
      PartitionFieldSpec("ts", Transform.Month) -> "DATE_FORMAT(ts, 'yyyy-MM')",
      PartitionFieldSpec("ts", Transform.Day) -> "CAST(ts AS DATE)",
      PartitionFieldSpec("ts", Transform.Day, format = Some("yyyy-MM-dd")) ->
        "DATE_FORMAT(ts, 'yyyy-MM-dd')",
      PartitionFieldSpec("ts", Transform.Hour) ->
        "DATE_FORMAT(ts, 'yyyy-MM-dd-HH')",
      PartitionFieldSpec("k", Transform.Bucket, numBuckets = Some(8)) ->
        "MOD((HASH(k) & 2147483647), 8)")
    for ((spec, expected) <- cases) {
      assert(DeltaPartitions.generationExpression(spec).contains(expected))
      val parsed = DeltaPartitions.parseExpression(expected, "c").get
      assert(parsed.sourceField == spec.sourceField)
      assert(parsed.transform == spec.transform)
      assert(parsed.numBuckets == spec.numBuckets)
    }
    // VALUE: no generated column
    assert(DeltaPartitions.generationExpression(
      PartitionFieldSpec("x", Transform.Value)).isEmpty)
  }

  test("generated columns are added to schema and recovered") {
    val base = StructType(Seq(StructField("id", LongType),
      StructField("ts", TimestampType)))
    val specs = Seq(PartitionFieldSpec("ts", Transform.Day))
    val widened = DeltaPartitions.withGeneratedColumns(base, specs)
    assert(widened.fieldNames.contains("ts_day"))
    val recovered = DeltaPartitions.specsFromSchema(widened, Seq("ts_day"))
    assert(recovered == Seq(PartitionFieldSpec("ts", Transform.Day)))
  }

  test("iceberg epoch-granularity transform values match the spec") {
    // reference IcebergPartitionValueConverter stores YEAR/MONTH/DAY/HOUR
    // as ints since epoch (IcebergPartitionValueConverter.java:58-155)
    assert(IcebergValues.transformValue("2020-01-05", DateType,
      Transform.Day, None) == 18266)
    assert(IcebergValues.transformValue("2020-01-05", DateType,
      Transform.Year, None) == 50)
    assert(IcebergValues.transformValue("2020-03-05", DateType,
      Transform.Month, None) == 602)
    // timestamp canonical form is epoch micros
    val micros = java.time.Instant.parse("2020-01-05T07:30:00Z")
      .getEpochSecond * 1000000L
    assert(IcebergValues.transformValue(micros.toString, TimestampType,
      Transform.Hour, None) == micros / 1000000L / 3600L)
    val b = IcebergValues.transformValue("abc", StringType,
      Transform.Bucket, Some(16)).asInstanceOf[Int]
    assert(b >= 0 && b < 16)
  }

  test("bucket hash matches the Iceberg spec's published test vectors") {
    // spec Appendix B hash column: ints/longs hashed as 8-byte LE
    import java.nio.{ByteBuffer, ByteOrder}
    def leLong(v: Long) = ByteBuffer.allocate(8)
      .order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()
    assert(graft.formats.iceberg.Murmur3.hashBytes(leLong(34L), 0) == 2017239379)
    assert(graft.formats.iceberg.Murmur3.hashBytes(
      "iceberg".getBytes("UTF-8"), 0) == 1210000089)
    // date 2017-11-16 = epoch day 17486
    assert(graft.formats.iceberg.Murmur3.hashBytes(leLong(17486L), 0) == -653330422)
  }

  test("iceberg field ids stay stable when a column is added mid-schema") {
    import graft.formats.iceberg.IcebergSchemas
    val v1 = IcebergSchemas.assignFieldIds(StructType(Seq(
      StructField("a", LongType), StructField("c", StringType))))
    val v2 = StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType),
      StructField("c", StringType)))
    val evolved = IcebergSchemas.evolveFieldIds(v1, v2)
    def id(s: StructType, n: String) =
      s(n).metadata.getLong(IcebergSchemas.FieldIdKey)
    assert(id(evolved, "a") == id(v1, "a"))
    assert(id(evolved, "c") == id(v1, "c"))      // would shift without merge
    assert(id(evolved, "b") == 3)                // fresh id past max
  }

  test("list/map element/key/value ids are unique and round-trip") {
    import graft.formats.iceberg.IcebergSchemas
    val schema = IcebergSchemas.assignFieldIds(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tags", ArrayType(StringType)),
      StructField("attrs", MapType(StringType, ArrayType(
        StructType(Seq(StructField("inner", IntegerType)))))))))
    val json = IcebergSchemas.toIcebergJson(schema)
    // the Iceberg spec requires every field/element/key/value id unique
    val ids = "\"(?:id|element-id|key-id|value-id)\"\\s*:\\s*(\\d+)".r
      .findAllMatchIn(json).map(_.group(1).toInt).toSeq
    assert(ids.nonEmpty && ids.distinct.size == ids.size,
      s"duplicate ids in $json")
    assert(!ids.contains(0), s"unassigned 0 id in $json")
    // round-trip preserves every id, including collection positions
    val back = IcebergSchemas.fromIcebergJson(json)
    assert(IcebergSchemas.toIcebergJson(back) == json)
  }

  test("collection ids stay stable under evolution") {
    import graft.formats.iceberg.IcebergSchemas
    val v1 = IcebergSchemas.assignFieldIds(StructType(Seq(
      StructField("a", LongType),
      StructField("tags", ArrayType(StringType)))))
    val v2 = StructType(Seq(
      StructField("a", LongType),
      StructField("extra", StringType),
      StructField("tags", ArrayType(StringType))))
    val evolved = IcebergSchemas.evolveFieldIds(v1, v2)
    def collJson(s: StructType, n: String) =
      s(n).metadata.getString(IcebergSchemas.CollectionIdsKey)
    assert(collJson(evolved, "tags") == collJson(v1, "tags"))
  }

  test("manifest avro schemas carry the spec's reserved field ids") {
    import graft.formats.iceberg.IcebergManifests
    def id(s: org.apache.avro.Schema, f: String): Int =
      s.getField(f).getObjectProp("field-id").asInstanceOf[Number].intValue
    val entry = IcebergManifests.EntrySchema
    assert(id(entry, "status") == 0)
    assert(id(entry, "snapshot_id") == 1)
    assert(id(entry, "data_file") == 2)
    val df = entry.getField("data_file").schema()
    assert(id(df, "file_path") == 100)
    assert(id(df, "record_count") == 103)
    assert(id(df, "lower_bounds") == 125)
    assert(id(df, "upper_bounds") == 128)
    val mf = IcebergManifests.ManifestFileSchema
    assert(id(mf, "manifest_path") == 500)
    assert(id(mf, "manifest_length") == 501)
    assert(id(mf, "added_snapshot_id") == 503)
  }

  test("schema evolution emits ordered rename/drop/promote/add ops") {
    import graft.formats.iceberg.IcebergSchemas
    val v1 = IcebergSchemas.assignFieldIds(StructType(Seq(
      StructField("a", IntegerType),
      StructField("b", StringType),
      StructField("c", DoubleType))))
    def id(s: StructType, n: String) =
      s(n).metadata.getLong(IcebergSchemas.FieldIdKey).toInt
    // rename b -> b2 (same id carried by the source), drop c, promote a,
    // add d
    val v2 = StructType(Seq(
      StructField("a", LongType),
      StructField("b2", StringType, nullable = true,
        metadata = new MetadataBuilder()
          .putLong(IcebergSchemas.FieldIdKey, id(v1, "b").toLong).build()),
      StructField("d", StringType)))
    val (evolved, ops) = IcebergSchemas.evolveWithOps(v1, v2)
    assert(id(evolved, "a") == id(v1, "a"))      // promoted in place
    assert(id(evolved, "b2") == id(v1, "b"))     // rename keeps id
    assert(id(evolved, "d") > id(v1, "c"))       // dropped id never reused
    assert(ops.map(_.op) == Seq("promote", "rename", "drop", "add"))
    assert(ops.find(_.op == "rename").get.fieldId == id(v1, "b"))
    assert(ops.find(_.op == "drop").get.fieldId == id(v1, "c"))
    // incompatible change refuses loudly
    val bad = StructType(Seq(StructField("a", StringType)))
    intercept[IllegalArgumentException] {
      IcebergSchemas.evolveWithOps(v1, bad)
    }
  }

  test("evolution survives two target syncs with stable ids") {
    import graft.formats.iceberg._
    import graft.sources.ParquetDirectorySource
    import graft.sync.TableFormatSync
    val target = tmpDir("evo_ice")
    val dataDir = tmpDir("evo_data")
    spark.read.parquet(sf("sf0.001") + "/region.parquet")
      .write.mode("overwrite").parquet(dataDir)
    val src = new ParquetDirectorySource(spark, dataDir, "region")
    val r1 = TableFormatSync.syncSnapshot(
      Seq(new IcebergConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)
    assert(r1.forall(_.status == "SUCCESS"))
    val ice1 = new IcebergConversionSource(spark, target, "region")
    val s1 = ice1.currentTable().schema
    def id(s: StructType, n: String) =
      s(n).metadata.getLong(IcebergSchemas.FieldIdKey).toInt

    // second sync: r_comment renamed (id-carried) and a column added
    val renamed = StructType(s1.fields.map { f =>
      if (f.name == "r_name") f.copy(name = "r_note") else f
    } :+ StructField("r_extra", LongType))
    val snap2 = src.currentSnapshot()
    val snapEvolved = snap2.copy(table = snap2.table.copy(
      schemaJson = renamed.json))
    val r2 = TableFormatSync.syncSnapshot(
      Seq(new IcebergConversionTarget(spark, target)),
      snapEvolved, src.sourceFormat)
    assert(r2.forall(_.status == "SUCCESS"))
    val s2 = new IcebergConversionSource(spark, target, "region")
      .currentTable().schema
    assert(id(s2, "r_note") == id(s1, "r_name"))      // rename kept id
    assert(id(s2, "r_regionkey") == id(s1, "r_regionkey"))
    assert(s2.fieldNames.contains("r_extra"))
    assert(id(s2, "r_extra") > s1.fields.map(f => id(s1, f.name)).max)
  }
}
