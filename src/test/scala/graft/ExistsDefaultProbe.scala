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
}
