package graft

import java.nio.file.{Files, Paths}

import graft.formats.delta._
import graft.sources.CatalogConversionSource
import graft.sync.TableFormatSync

class DeletionVectorSpec extends SparkSuite {

  test("DV rewrite pairs are dropped from per-commit diffs") {
    // hand-written log: v0 creates files a,b; v1 rewrites a with a
    // deletion vector (add a + remove a in the same commit) and truly
    // removes b
    val table = tmpDir("dv_table")
    val log = Paths.get(table, "_delta_log")
    Files.createDirectories(log)
    val schema = """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}"""
    def meta(v: Long) =
      s"""{"metaData":{"id":"t","schemaString":"$schema","partitionColumns":[],"configuration":{},"createdTime":1,"format":{"provider":"parquet","options":{}}}}"""
    Files.writeString(log.resolve("00000000000000000000.json"),
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |${meta(0)}
         |{"add":{"path":"a.parquet","size":10,"modificationTime":1,"dataChange":true,"partitionValues":{},"stats":""}}
         |{"add":{"path":"b.parquet","size":10,"modificationTime":1,"dataChange":true,"partitionValues":{},"stats":""}}
         |""".stripMargin)
    Files.writeString(log.resolve("00000000000000000001.json"),
      s"""${meta(1)}
         |{"add":{"path":"a.parquet","size":10,"modificationTime":2,"dataChange":true,"partitionValues":{},"stats":"","deletionVector":{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":40,"cardinality":2}}}
         |{"remove":{"path":"a.parquet","deletionTimestamp":2,"dataChange":true}}
         |{"remove":{"path":"b.parquet","deletionTimestamp":2,"dataChange":true}}
         |""".stripMargin)

    val src = new DeltaConversionSource(spark, table, "dv")
    val change = src.changeForCommit("1")
    val added = change.diff.added.collect().map(_.path)
    val removed = change.diff.removed.collect().map(_.path)
    // a.parquet DV-rewrite: no file-level change; b.parquet: real removal
    assert(added.isEmpty, added.mkString(","))
    assert(removed.map(_.split('/').last).toSeq == Seq("b.parquet"))
    // live set at head: only a.parquet (with DV, file still live)
    val live = src.currentSnapshot().files.collect().map(_.path.split('/').last)
    assert(live.toSeq == Seq("a.parquet"))
  }

  test("catalog conversion source detects formats from layout") {
    val src = new graft.sources.ParquetDirectorySource(spark,
      sf("sf0.001/nation.parquet"), "nation")
    val deltaDir = tmpDir("cat_delta")
    TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, deltaDir)),
      src.currentSnapshot(), src.sourceFormat)
    assert(CatalogConversionSource.detectFormat(deltaDir) == "DELTA")
    assert(CatalogConversionSource.detectFormat(sf("sf0.001")) == "PARQUET")

    val resolved = CatalogConversionSource.fromPath(spark, deltaDir, "nation")
    assert(resolved.sourceFormat == "DELTA")
    assert(resolved.currentSnapshot().files.count() == 1)

    // via the session catalog
    val fq = graft.sync.CatalogSync.syncTable(spark, "cat_db",
      src.currentTable())
    val fromCat = CatalogConversionSource.fromCatalog(spark, fq)
    assert(fromCat.sourceFormat == "PARQUET")
    graft.sync.CatalogSync.dropTable(spark, fq)
  }
}
