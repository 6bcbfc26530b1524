package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** df.write.format("graft").option("tableFormat", ...) — batch writes
  * landing in Iceberg/Hudi/Paimon through the conversion targets.
  */
class GraftBatchWriteSpec extends SparkSuite {

  private def rows(from: Long, until: Long): DataFrame = {
    import spark.implicits._
    (from until until).map(i => (i, s"v$i", i % 5)).toDF("id", "name", "grp")
  }

  test("iceberg/hudi/paimon: create, append, overwrite, read back") {
    for (fmt <- Seq("iceberg", "hudi", "paimon")) {
      val t = tmpDir(s"gbw_$fmt")
      rows(0, 100).write.format("graft").option("tableFormat", fmt)
        .mode("append").save(t)
      rows(100, 150).write.format("graft").option("tableFormat", fmt)
        .mode("append").save(t)
      val df = spark.read.format("graft").load(t)
      assert(df.count() == 150, s"$fmt after appends")
      assert(df.filter(col("id") === 120L).count() == 1, s"$fmt appended row")

      rows(0, 30).write.format("graft").option("tableFormat", fmt)
        .mode("overwrite").save(t)
      val after = spark.read.format("graft").load(t)
      assert(after.count() == 30, s"$fmt after overwrite")
      // history: three commits on the versioned metadata plane
      val hist = spark.read.format("graft").option("metaTable", "history")
        .load(t)
      assert(hist.count() >= 3, s"$fmt history ${hist.count()}")
    }
  }

  test("partitioned paimon write: hive layout, partition pruning serves") {
    val t = tmpDir("gbw_part")
    rows(0, 200).write.format("graft").option("tableFormat", "paimon")
      .partitionBy("grp").mode("append").save(t)
    val df = spark.read.format("graft").load(t)
    assert(df.count() == 200)
    assert(df.filter(col("grp") === 3L).count() == 40)
    // partitionBy disagreement on append refuses
    intercept[IllegalArgumentException] {
      rows(200, 210).write.format("graft").option("tableFormat", "paimon")
        .partitionBy("name").mode("append").save(t)
    }
    // bare append inherits the table's partitioning
    rows(200, 210).write.format("graft").option("tableFormat", "paimon")
      .mode("append").save(t)
    assert(spark.read.format("graft").load(t).count() == 210)
  }

  test("guard rails: format pinning, schema gate, save modes") {
    val t = tmpDir("gbw_guard")
    rows(0, 10).write.format("graft").option("tableFormat", "iceberg")
      .mode("append").save(t)
    // an existing table pins its format
    intercept[IllegalArgumentException] {
      rows(10, 20).write.format("graft").option("tableFormat", "hudi")
        .mode("append").save(t)
    }
    // schema drift refuses (ALTER first)
    intercept[Exception] {
      rows(10, 20).withColumn("extra", lit(1))
        .write.format("graft").option("tableFormat", "iceberg")
        .mode("append").save(t)
    }
    // ErrorIfExists / Ignore contracts
    intercept[IllegalArgumentException] {
      rows(0, 5).write.format("graft").option("tableFormat", "iceberg")
        .mode("errorifexists").save(t)
    }
    rows(0, 5).write.format("graft").option("tableFormat", "iceberg")
      .mode("ignore").save(t) // no-op
    assert(spark.read.format("graft").load(t).count() == 10)
    // tableFormat omitted on an existing non-delta table: format detected
    rows(10, 20).write.format("graft").mode("append").save(t)
    assert(spark.read.format("graft").load(t).count() == 20)
  }
}
