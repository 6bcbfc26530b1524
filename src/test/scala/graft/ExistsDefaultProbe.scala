package graft

import org.apache.spark.sql.types._

/** Pins the Spark mechanism Iceberg v3 `initial-default` is mapped onto
  * (IcebergMetadata.read): the parquet scan fills ABSENT columns from
  * StructField EXISTS_DEFAULT metadata while files that DO carry the
  * column serve stored values — including explicit nulls. If a Spark
  * upgrade changed this contract, v3 default serving would silently
  * break; this probe fails first.
  */
class ExistsDefaultProbe extends SparkSuite {
  test("parquet scan fills absent columns from EXISTS_DEFAULT") {
    val dir = tmpDir("exdef")
    spark.range(3).selectExpr("id").write.parquet(dir + "/old")
    spark.range(3, 5).selectExpr("id", "CAST(null AS INT) AS extra")
      .write.parquet(dir + "/new")
    val md = new MetadataBuilder()
      .putString("EXISTS_DEFAULT", "42").build()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("extra", IntegerType, nullable = true, metadata = md)))
    val rows = spark.read.schema(schema)
      .parquet(dir + "/old", dir + "/new")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getInt(1))).toMap
    info(rows.toString)
    assert(rows(0L) == 42 && rows(1L) == 42 && rows(2L) == 42,
      s"absent column must serve the existence default: $rows")
    assert(rows(3L) == null && rows(4L) == null,
      s"explicit nulls must stay null: $rows")
  }

  test("complex and temporal EXISTS_DEFAULTs fill; binary does not " +
    "(why the read side refuses binary defaults)") {
    // pins the boundary IcebergSchemas.defaultRepresentable encodes:
    // struct/array/map/decimal/timestamp/timestamp_ntz constants fill
    // under the default (vectorized) scan; binary throws in
    // ParquetColumnVector — so v3 binary initial-defaults must REFUSE
    // at read/DDL instead of being accepted and then failing every scan
    val dir = tmpDir("exdef_cplx")
    spark.range(3).selectExpr("id").write.parquet(dir + "/old")
    def md(sql: String) =
      new MetadataBuilder().putString("EXISTS_DEFAULT", sql).build()
    val served: Seq[(String, DataType, String)] = Seq(
      ("s", StructType(Seq(StructField("a", IntegerType),
        StructField("b", StringType))), "NAMED_STRUCT('a', 1, 'b', 'x')"),
      ("l", ArrayType(IntegerType), "ARRAY(1, 2, 3)"),
      ("m", MapType(StringType, LongType), "MAP('a', 1L)"),
      ("d", DecimalType(9, 2), "14.20BD"),
      ("t", TimestampType, "TIMESTAMP '2017-11-16 22:31:08.123456'"),
      ("tn", TimestampNTZType,
        "TIMESTAMP_NTZ '2017-11-16 22:31:08.123456'"))
    val schema = StructType(StructField("id", LongType) +: served.map {
      case (n, dt, sql) => StructField(n, dt, nullable = true,
        metadata = md(sql))
    })
    val rows = spark.read.schema(schema).parquet(dir + "/old").collect()
    for (((n, _, _), i) <- served.zipWithIndex)
      assert(rows.forall(!_.isNullAt(i + 1)),
        s"column '$n' must serve its existence default")
    assert(rows.map(_.getStruct(1)).forall(s =>
      s.getInt(0) == 1 && s.getString(1) == "x"))
    assert(rows.map(_.getSeq[Int](2)).forall(_ == Seq(1, 2, 3)))

    val binSchema = StructType(Seq(StructField("id", LongType),
      StructField("bn", BinaryType, nullable = true,
        metadata = md("X'000102FF'"))))
    val e = intercept[Exception] {
      spark.read.schema(binSchema).parquet(dir + "/old").collect()
    }
    assert(e.toString.contains("FAILED_READ_FILE") ||
      e.getMessage.contains("not supported"),
      s"binary existence default unexpectedly served: $e")
  }
}
