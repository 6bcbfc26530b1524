package graft

import org.apache.spark.sql.functions._

import graft.operators.MaterializedAgg

/** Incremental view maintenance against full recomputes: every commit
  * kind the change feed can produce (insert, row-level delete, in-place
  * update) must fold into the same state a rescan would build, and a
  * group whose rows all disappear must leave the state entirely.
  */
class MaterializedAggSpec extends SparkSuite {

  test("view state tracks append, update and delete commits exactly; " +
      "emptied groups leave the state") {
    import spark.implicits._
    val t = tmpDir("mv_tbl")
    val mv = tmpDir("mv_state")
    val keys = Seq("k")
    val measures = Seq("v")

    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0))
      .toDF("id", "k", "v").write.format("graft").save(t)
    val r1 = MaterializedAgg.refresh(spark, t, mv, keys, measures)
    assert(r1.toVersion == 0L && r1.groups == 2L)

    def stateMap = MaterializedAgg.read(spark, mv).collect()
      .map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("__mv_count"), r.getAs[Long]("__mv_sum_v"))))
      .toMap
    assert(stateMap == Map("a" -> ((2L, 30000000L)),
      "b" -> ((1L, 5000000L))))

    // in-place update: the feed nets pre/post (or delete+insert) to the
    // value delta
    graft.formats.delta.DeltaDeletes.updateWhere(spark, t,
      col("id") === 2L, Map("v" -> lit(25.0)))
    MaterializedAgg.refresh(spark, t, mv, keys, measures)
    assert(stateMap == Map("a" -> ((2L, 35000000L)),
      "b" -> ((1L, 5000000L))))

    // delete the whole of group b -> it must leave the state
    graft.formats.delta.DeltaDeletes.deleteWhere(spark, t, col("k") === "b")
    val r3 = MaterializedAgg.refresh(spark, t, mv, keys, measures)
    assert(r3.groups == 1L)
    assert(stateMap == Map("a" -> ((2L, 35000000L))))

    // equals the full recompute (DV-masking read — the table carries
    // live deletion vectors after deleteWhere)
    val full = new graft.formats.delta.DeltaConversionSource(
      spark, t, "mv_tbl").toDataFrame
      .groupBy("k").agg(count(lit(1)).as("cnt"),
        sum(graft.queries.Gate.micros(col("v"))).as("sum_micros"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(full == Set(("a", 2L, 35000000L)))

    // read() before any refresh refuses loudly
    val e = intercept[IllegalStateException](
      MaterializedAgg.read(spark, tmpDir("mv_none")))
    assert(e.getMessage.contains("refresh"))
  }

  test("the view refreshes from an ICEBERG table's change feed too") {
    import org.apache.spark.sql.functions.col
    import java.nio.file.{Files, Paths}
    val dataDir = tmpDir("mv_ice_data")
    val t = tmpDir("mv_ice_tbl")
    val mv = tmpDir("mv_ice_state")
    val region = spark.read.parquet(sf("sf0.001/region.parquet"))
    def addBatch(df: org.apache.spark.sql.DataFrame, name: String,
        mtime: Long): Unit = {
      val tmp = tmpDir(s"mv_ice_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Paths.get(tmp).toFile.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(dataDir, s"$name.parquet"))
      Paths.get(dataDir, s"$name.parquet").toFile.setLastModified(mtime)
    }
    def sync(): Unit = {
      val src = new graft.sources.ParquetDirectorySource(
        spark, dataDir, "region")
      val o = graft.sync.TableFormatSync.syncSnapshot(
        Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, t)),
        src.currentSnapshot(), src.sourceFormat)
      assert(o.forall(_.status == "SUCCESS"), o.mkString(";"))
    }
    addBatch(region.filter(col("r_regionkey") < 3), "b1", 1000000L)
    sync()
    val r1 = MaterializedAgg.refresh(spark, t, mv, Seq("r_name"),
      Seq("r_regionkey"))
    assert(r1.groups == 3L)

    // incremental append lands as a second snapshot -> one more fold
    addBatch(region, "b2", 2000000L)
    sync()
    val r2 = MaterializedAgg.refresh(spark, t, mv, Seq("r_name"),
      Seq("r_regionkey"))
    assert(r2.toVersion > r1.toVersion && r2.groups == 5L)
    val counts = MaterializedAgg.read(spark, mv).collect()
      .map(r => r.getAs[String]("r_name") -> r.getAs[Long]("__mv_count"))
      .toMap
    // first three regions appear twice (b1 + full b2), last two once
    assert(counts.values.toSeq.sorted == Seq(1L, 1L, 2L, 2L, 2L), counts)
  }

  test("SQL CREATE / REFRESH MATERIALIZED VIEW drive the same view") {
    import spark.implicits._
    val t = tmpDir("mv_sql_tbl")
    val mv = s"${tmpDir("mv_sql_state")}/view"
    Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("id", "k", "v").write.format("graft").save(t)
    val gs = graft.sql.GraftSql.session(spark)
    val created = gs.sql(s"GRAFT CREATE MATERIALIZED VIEW '$mv' " +
      s"OVER '$t' KEYS (k) MEASURES (v)").head()
    assert(created.getLong(0) == 0L && created.getLong(1) == 2L)
    // re-create refuses; refresh with no new commits is a no-op
    val dup = intercept[Exception](gs.sql(
      s"GRAFT CREATE MATERIALIZED VIEW '$mv' OVER '$t' KEYS (k) " +
        "MEASURES (v)"))
    assert(dup.getMessage.contains("already defined"))
    val r = gs.sql(s"GRAFT REFRESH MATERIALIZED VIEW '$mv'").head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 2L)
    // a new commit folds in through the SQL refresh
    Seq((3L, "a", 5.0)).toDF("id", "k", "v")
      .write.format("graft").mode("append").save(t)
    val r2 = gs.sql(s"GRAFT REFRESH MATERIALIZED VIEW '$mv'").head()
    assert(r2.getLong(0) == 1L)
    val state = MaterializedAgg.read(spark, mv).collect()
      .map(x => x.getAs[String]("k") -> x.getAs[Long]("__mv_count")).toMap
    assert(state == Map("a" -> 2L, "b" -> 1L))
    // refreshing an undefined view refuses with guidance
    val none = intercept[Exception](gs.sql(
      s"GRAFT REFRESH MATERIALIZED VIEW '${tmpDir("mv_nodef")}'"))
    assert(none.getMessage.contains("CREATE MATERIALIZED VIEW"))
  }
}
