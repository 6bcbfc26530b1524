package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** Metadata-plane count(*) pushdown (plans/MetadataAggregates.scala):
  * fires only on safe shapes, always matches the real scan's answer.
  */
class MetadataCountSpec extends SparkSuite {

  private lazy val gs = graft.sql.GraftSql.session(spark)

  private def mkDelta(prefix: String, n: Long, files: Int): String = {
    import spark.implicits._
    val t = tmpDir(prefix)
    graft.formats.delta.DeltaWrite.write(spark, t,
      (0L until n).map(i => (i, s"v$i")).toDF("id", "name")
        .repartition(files), overwrite = false)
    t
  }

  // the rule rewrites the OPTIMIZED LOGICAL plan (AQE hides physical
  // scans from a naive collect): a surviving LogicalRelation = real scan
  private def scansOf(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l
    }.size

  test("unfiltered count(*) is metadata-only and exact") {
    val t = mkDelta("cnt_basic", 1234, 4)
    val df = gs.read.format("graft").load(t).agg(count(lit(1)).as("cnt"))
    assert(scansOf(df) == 0, "expected a metadata-only plan")
    assert(df.head().getLong(0) == 1234L)
    // sql surface too
    gs.read.format("graft").load(t).createOrReplaceTempView("cnt_t")
    val viaSql = gs.sql("SELECT count(*) AS c FROM cnt_t")
    assert(scansOf(viaSql) == 0 && viaSql.head().getLong(0) == 1234L)
  }

  test("filters, groupBy and column aggregates keep the real scan") {
    val t = mkDelta("cnt_guard", 500, 2)
    val base = gs.read.format("graft").load(t)
    val filtered = base.filter(col("id") < 100).agg(count(lit(1)).as("c"))
    assert(scansOf(filtered) == 1, "a filtered count must scan")
    assert(filtered.head().getLong(0) == 100L)
    val grouped = base.groupBy(col("id") % 2).agg(count(lit(1)).as("c"))
    assert(scansOf(grouped) == 1, "a grouped count must scan")
    val colAgg = base.agg(sum("id").as("s"))
    assert(scansOf(colAgg) == 1, "a column aggregate must scan")
    assert(colAgg.head().getLong(0) == (0L until 500L).sum)
  }

  test("count stays exact through delete + compaction") {
    val t = mkDelta("cnt_delete", 300, 3)
    require(graft.formats.delta.DeltaDeletes.deleteWhere(spark, t,
      col("id") < 50) == 50)
    // live DVs: the relation refuses (phantom rows) — no wrong count
    intercept[graft.model.DeletionVectorsUnsupported] {
      gs.read.format("graft").load(t).agg(count(lit(1))).head()
    }
    graft.formats.delta.DeltaOptimize.compact(spark, t)
    val df = gs.read.format("graft").load(t).agg(count(lit(1)).as("c"))
    assert(scansOf(df) == 0 && df.head().getLong(0) == 250L)
  }

  test("partition-column DISTINCT and GROUP BY count(*) are " +
    "metadata-only and exact") {
    import spark.implicits._
    val t = tmpDir("cnt_parts")
    graft.formats.delta.DeltaWrite.write(spark, t,
      (0L until 600L).map(i => (i, s"v$i", s"g${i % 3}"))
        .toDF("id", "name", "grp").repartition(4),
      overwrite = false, partitionCols = Seq("grp"))
    val base = gs.read.format("graft").load(t)

    val distinct = base.select("grp").distinct()
    assert(scansOf(distinct) == 0, "DISTINCT partition must be metadata-only")
    assert(distinct.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("g0", "g1", "g2"))

    val counts = base.groupBy("grp").agg(count(lit(1)).as("c"))
    assert(scansOf(counts) == 0, "GROUP BY partition count must be " +
      "metadata-only")
    assert(counts.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq == Seq(("g0", 200L), ("g1", 200L), ("g2", 200L)))

    // grouping by a NON-partition column keeps the scan
    val byData = base.groupBy("name").agg(count(lit(1)))
    assert(scansOf(byData) == 1)
    // aggregates beyond count keep the scan
    val withSum = base.groupBy("grp").agg(sum("id"))
    assert(scansOf(withSum) == 1)

    // min/max over the PARTITION column: exact from partition values
    val mm = base.agg(min("grp").as("lo"), max("grp").as("hi"),
      count(lit(1)).as("c"))
    assert(scansOf(mm) == 0, "partition min/max must be metadata-only")
    val r = mm.head()
    assert(r.getString(0) == "g0" && r.getString(1) == "g2" &&
      r.getLong(2) == 600L)
    // min/max over a DATA column keeps the scan
    val dataMm = base.agg(min("id"))
    assert(scansOf(dataMm) == 1)
    assert(dataMm.head().getLong(0) == 0L)
  }

  test("pushdown fires on iceberg and paimon synced tables too") {
    import spark.implicits._
    for (fmt <- Seq("iceberg", "paimon")) {
      val data = tmpDir(s"cnt_${fmt}_data")
      (0L until 400L).map(i => (i, s"v$i")).toDF("id", "name")
        .repartition(2).write.mode("overwrite").parquet(data)
      val t = tmpDir(s"cnt_$fmt")
      val src = new graft.sources.ParquetDirectorySource(spark, data, "t")
      val target: graft.spi.ConversionTarget =
        if (fmt == "iceberg")
          new graft.formats.iceberg.IcebergConversionTarget(spark, t)
        else new graft.formats.paimon.PaimonConversionTarget(spark, t)
      val out = graft.sync.TableFormatSync.syncSnapshot(Seq(target),
        src.currentSnapshot(), src.sourceFormat)
      require(out.forall(_.status == "SUCCESS"), out.mkString(";"))
      val df = gs.read.format("graft").load(t).agg(count(lit(1)).as("c"))
      assert(scansOf(df) == 0 && df.head().getLong(0) == 400L, fmt)
    }
  }
  test("zero-file table: partition min/max bails to the scan (null), " +
    "count stays 0 — never throws") {
    // a partitioned table whose only commit carries no files (metaData
    // only): min(partition) has no metadata answer and must fall back
    val t = tmpDir("cnt_empty")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType)))
    val schemaJson = schema.json.replace("\"", "\\\"")
    val log =
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"empty-test","schemaString":"$schemaJson","partitionColumns":["grp"],"configuration":{},"createdTime":1}}
         |""".stripMargin
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(t, "_delta_log"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_delta_log", "00000000000000000000.json"),
      log.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val base = gs.read.format("graft").load(t)
    val mm = base.agg(min("grp").as("lo"), max("grp").as("hi"),
      count(lit(1)).as("c"))
    val r = mm.head()   // pre-fix: UnsupportedOperationException empty.min
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getLong(2) == 0L)
    // plain count over the empty listing stays metadata-only and 0
    val cnt = base.agg(count(lit(1)).as("c"))
    assert(scansOf(cnt) == 0 && cnt.head().getLong(0) == 0L)
  }
}
