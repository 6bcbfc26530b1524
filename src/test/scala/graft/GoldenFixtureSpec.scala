package graft

import graft.formats.delta.{DeltaConversionSource, DeltaConversionTarget}
import graft.formats.hudi.{HudiConversionSource, HudiTimeline}

/** Byte-level interop against metadata authored by the REAL format writers
  * — not this library's own targets — so spec conformance stops being
  * self-referential. Fixtures under `src/test/resources/golden/` are the
  * public demo tables of apache/incubator-xtable (`demo/data/db/`):
  *   - `delta_dimGeography`: written by real delta-spark (protocol 1/2
  *     JSON log, inline stats, no checkpoint)
  *   - `hudi_dimCustomer`: written by real Hudi 0.14 (COW, real
  *     `<fileId>_<token>_<instant>` base-file naming, HoodieCommitMetadata
  *     JSON whose `extraMetadata.schema` is an AVRO schema, HFile metadata
  *     table this reader must ignore, `.requested`/`.inflight` instants)
  */
class GoldenFixtureSpec extends SparkSuite {

  private def golden(name: String): String =
    getClass.getResource(s"/golden/$name").getPath

  test("reads a real delta-spark table's log byte-for-byte") {
    val dir = golden("delta_dimGeography")
    val src = new DeltaConversionSource(spark, dir, "dimGeography")
    val snap = src.currentSnapshot()
    val files = snap.files.collect()
    assert(files.length == 1)
    assert(files.head.path.endsWith(
      "part-00000-6ccb71bc-9cc1-4226-a7b5-f752edbedee6-c000.snappy.parquet"))
    assert(files.head.recordCount == 674)        // from the add's stats JSON
    assert(files.head.fileSizeBytes == 12822)
    val gk = files.head.columnStats.find(_.field == "GeographyKey")
    assert(gk.exists(s => s.min.contains("1") && s.max.contains("952")))
    assert(gk.exists(_.numNulls == 0))
    assert(snap.table.schema.fieldNames.toSeq == Seq("GeographyKey",
      "GeographyType", "ContinentName", "CityName", "StateProvinceName",
      "RegionCountryName"))
    assert(src.toDataFrame.count() == 674)
  }

  test("reads a real hudi-written table: timeline, naming, avro schema") {
    val dir = golden("hudi_dimCustomer")
    // only the COMPLETED instant — .requested/.inflight are not commits
    assert(HudiTimeline.listInstants(dir) == Seq("20231105172136406"))
    assert(HudiTimeline.tableType(dir) == "COPY_ON_WRITE")
    assert(HudiTimeline.tableName(dir).contains("hudi_dimCustomer"))

    val src = new HudiConversionSource(spark, dir, "hudi_dimCustomer")
    val table = src.currentTable()
    // schema parsed from the real writer's AVRO under extraMetadata.schema
    assert(table.schema.fieldNames.contains("CustomerKey"))
    assert(table.schema.fieldNames.contains("GeographyKey"))

    val snap = src.currentSnapshot()
    val files = snap.files.collect()
    assert(files.length == 1)
    assert(files.head.path.endsWith(
      "b1ee44c7-255b-47bf-b788-1e7017790326-0_0-80-172_20231105172136406.parquet"))
    assert(files.head.recordCount == 5000)
    // stats came from the footer fallback (the real HFile metadata table
    // is unreadable here and must be silently skipped, not crash)
    assert(files.head.columnStats.nonEmpty)
    assert(src.toDataFrame.count() == 5000)
  }

  test("real hudi table syncs to delta and reads row-identical") {
    val dir = golden("hudi_dimCustomer")
    val deltaDir = tmpDir("golden_hudi_delta")
    val src = new HudiConversionSource(spark, dir, "hudi_dimCustomer")
    val out = graft.sync.TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, deltaDir)), src.currentSnapshot(),
      src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    val back = new DeltaConversionSource(spark, deltaDir, "hudi_dimCustomer")
      .toDataFrame
    assert(back.count() == 5000)
    val direct = spark.read.parquet(
      s"$dir/b1ee44c7-255b-47bf-b788-1e7017790326-0_0-80-172_20231105172136406.parquet")
    assert(back.agg(org.apache.spark.sql.functions.sum("CustomerKey")).head.get(0) ==
      direct.agg(org.apache.spark.sql.functions.sum("CustomerKey")).head.get(0))
  }
}
