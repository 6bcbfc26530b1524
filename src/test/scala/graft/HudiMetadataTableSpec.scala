package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.formats.hudi.{HFiles, HudiMetadataTable}

/** The Hudi `.hoodie/metadata` wire format, proven two ways: parse the
  * REAL Hudi-0.14-written metadata table in the golden fixture
  * (reader), and reproduce its byte patterns from scratch (writer) —
  * bloom Writable bytes, bootstrap record bytes and the log.1 marker
  * are compared byte-for-byte against the golden files.
  */
class HudiMetadataTableSpec extends SparkSuite {

  // the metadata log files are dot-prefixed and sbt's resource copy
  // drops hidden files, so this spec reads the fixture from the source
  // tree rather than the classpath
  private val goldenTable = Paths.get(
    "src/test/resources/golden/hudi_dimCustomer").toAbsolutePath.toString
  private val goldenFilesDir =
    s"$goldenTable/.hoodie/metadata/files"
  private val goldenBase =
    s"$goldenFilesDir/files-0000-0_0-73-165_00000000000000010.hfile"

  test("reads the real Hudi metadata table: merged files listing " +
      "matches the physical data files") {
    val (partitions, files) = HudiMetadataTable.readFiles(goldenTable)
    assert(partitions == Set("."))
    val root = files(".")
    assert(root.keySet ==
      Set("b1ee44c7-255b-47bf-b788-1e7017790326-0_0-80-172_20231105172136406.parquet"))
    // size in the metadata record equals the physical file's size
    val physical = Paths.get(goldenTable,
      "b1ee44c7-255b-47bf-b788-1e7017790326-0_0-80-172_20231105172136406.parquet")
    assert(root.values.head == Files.size(physical))
  }

  test("parses the golden base HFile: trailer, file info, comparator") {
    val hf = HFiles.read(Files.readAllBytes(Paths.get(goldenBase)))
    assert(hf.cells.length == 1)
    assert(hf.cells.head.rowString == "__all_partitions__")
    assert(hf.comparator ==
      "org.apache.hudi.io.storage.HoodieHBaseKVComparator")
    assert(hf.trailerFields(7) == 1L)   // entry count
    assert(hf.trailerFields(12) == 1L)  // GZ codec
    assert(hf.fileInfoString("bloomFilterTypeCode").contains("DYNAMIC_V0"))
    assert(hf.fileInfoString("minRecordKey").contains("__all_partitions__"))
    assert(hf.fileInfoString("schema")
      .exists(_.contains("HoodieMetadataRecord")))
  }

  test("golden bloom filter: geometry, membership, and byte-identical " +
      "re-serialization") {
    val hf = HFiles.read(Files.readAllBytes(Paths.get(goldenBase)))
    val b64 = hf.metaBlocks("bloomFilter")
    val writable = java.util.Base64.getDecoder.decode(b64)
    val bloom = HFiles.deserializeBloom(writable)
    assert(bloom.mightContain(
      "__all_partitions__".getBytes(StandardCharsets.UTF_8)))
    assert(!bloom.mightContain("2015/03/16".getBytes(StandardCharsets.UTF_8)))
    assert(!bloom.mightContain("level=INFO".getBytes(StandardCharsets.UTF_8)))

    // write path: same single key -> byte-identical Writable
    val ours = new HFiles.DynamicBloom()
    ours.add("__all_partitions__".getBytes(StandardCharsets.UTF_8))
    assert(java.util.Arrays.equals(ours.serialize(), writable),
      "bloom Writable bytes differ from the golden Hudi writer's")
  }

  test("bootstrap record bytes reproduce the golden base cell exactly") {
    val hf = HFiles.read(Files.readAllBytes(Paths.get(goldenBase)))
    val goldenValue = hf.cells.head.value
    val ours = HudiMetadataTable.recordBytes(1, Nil,
      Some("files-0000-0_0-73-165_00000000000000010.hfile"))
    assert(java.util.Arrays.equals(ours, goldenValue),
      "bootstrap HoodieMetadataRecord encoding drifted from golden bytes")
  }

  test("HFile write -> read round trip across blocks and checksum chunks") {
    val cells = (0 until 3000).map { i =>
      val row = f"part=$i%06d".getBytes(StandardCharsets.UTF_8)
      val value = HudiMetadataTable.recordBytes(2,
        Seq((s"file-$i.parquet", i.toLong * 10, false),
          (s"gone-$i.parquet", 0L, true)))
      (row, value)
    }
    val bytes = HFiles.write(cells.iterator, HudiMetadataTable.schemaJson,
      bloom = true)
    val hf = HFiles.read(bytes)
    assert(hf.cells.length == 3000)
    assert(hf.cells.head.rowString == "part=000000")
    assert(hf.cells.last.rowString == "part=002999")
    assert(hf.trailerFields(7) == 3000L)
    assert(hf.trailerFields(5) > 1L, "expected multiple data blocks")
    val bloom = HFiles.deserializeBloom(java.util.Base64.getDecoder
      .decode(hf.metaBlocks("bloomFilter")))
    assert(bloom.mightContain(
      "part=001234".getBytes(StandardCharsets.UTF_8)))
    assert(!bloom.mightContain(
      "part=999999".getBytes(StandardCharsets.UTF_8)))
    assert(hf.fileInfoString("minRecordKey").contains("part=000000"))
    assert(hf.fileInfoString("maxRecordKey").contains("part=002999"))
  }

  test("HFile writer refuses out-of-order cells loudly") {
    val bad = Seq(
      "b".getBytes(StandardCharsets.UTF_8) -> Array[Byte](1),
      "a".getBytes(StandardCharsets.UTF_8) -> Array[Byte](2))
    val e = intercept[IllegalArgumentException] {
      HFiles.write(bad.iterator, "{}", bloom = false)
    }
    assert(e.getMessage.contains("out of order"))
  }

  test("bootstrap + commits on a fresh table: merged listing tracks " +
      "adds, deletes and partitions; log.1 is byte-identical to golden") {
    val dir = tmpDir("hudi-meta")
    HudiMetadataTable.bootstrap(dir, "t1")
    assert(HudiMetadataTable.exists(dir))
    // bootstrap is idempotent
    HudiMetadataTable.bootstrap(dir, "t1")

    val goldenLog1 = Files.readAllBytes(Paths.get(goldenFilesDir,
      ".files-0000-0_00000000000000010.log.1_0-0-0"))
    val ourLog1 = Files.readAllBytes(Paths.get(
      HudiMetadataTable.metadataPath(dir), "files",
      ".files-0000-0_00000000000000010.log.1_0-0-0"))
    assert(java.util.Arrays.equals(ourLog1, goldenLog1),
      "bootstrap log.1 marker differs from the golden 80-byte block")

    val (p0, f0) = HudiMetadataTable.readFiles(dir)
    assert(p0.isEmpty && f0.isEmpty)

    HudiMetadataTable.appendCommitSmall(dir, "20260101000000000",
      adds = Seq(("level=INFO", "a.parquet", 100L),
        ("level=WARN", "b.parquet", 200L)))
    val (p1, f1) = HudiMetadataTable.readFiles(dir)
    assert(p1 == Set("level=INFO", "level=WARN"))
    assert(f1("level=INFO") == Map("a.parquet" -> 100L))
    assert(f1("level=WARN") == Map("b.parquet" -> 200L))

    // second commit: new file in an existing partition + a tombstone
    HudiMetadataTable.appendCommitSmall(dir, "20260101000000001",
      adds = Seq(("level=INFO", "c.parquet", 300L)),
      deletes = Seq(("level=WARN", "b.parquet")))
    val (p2, f2) = HudiMetadataTable.readFiles(dir)
    assert(p2 == Set("level=INFO", "level=WARN"))
    assert(f2("level=INFO") == Map("a.parquet" -> 100L,
      "c.parquet" -> 300L))
    assert(f2.getOrElse("level=WARN", Map.empty).isEmpty)

    // the metadata table's own timeline carries the three deltacommits
    val instants = graft.formats.hudi.HudiTimeline
      .listInstants(HudiMetadataTable.metadataPath(dir))
    assert(instants == Seq("00000000000000010", "20260101000000000",
      "20260101000000001"))
  }

  test("log chain compacts into a fresh base HFile past the threshold " +
      "and the merged listing survives") {
    val dir = tmpDir("hudi-meta-compact")
    HudiMetadataTable.bootstrap(dir, "tc")
    val n = HudiMetadataTable.CompactLogThreshold + 2
    (1 to n).foreach { i =>
      HudiMetadataTable.appendCommitSmall(dir, f"2026010100000$i%04d",
        adds = Seq((s"day=$i", s"f$i.parquet", i.toLong)))
    }
    val filesDir = Paths.get(HudiMetadataTable.metadataPath(dir), "files")
    val names = filesDir.toFile.list().toSeq
    val bases = names.filter(x => !x.startsWith(".") && x.endsWith(".hfile"))
    assert(bases.size == 1, s"exactly one base after compaction: $bases")
    assert(!bases.head.contains("00000000000000010"),
      "bootstrap base should be swept after compaction")
    val logs = names.filter(n => n.contains(".log.") &&
      !n.endsWith(".crc"))
    assert(logs.size <= HudiMetadataTable.CompactLogThreshold,
      s"log chain should reset at compaction: $logs")
    // no stale slice files (nor their Hadoop .crc siblings) left behind
    assert(!names.exists(n => n.contains("_00000000000000010.log.") ||
      n.contains("_00000000000000010.hfile")),
      s"old slice not swept: ${names.filter(_.contains("000000000010"))}")
    // merged listing intact and bloom-indexed base serves every partition
    val (parts, files) = HudiMetadataTable.readFiles(dir)
    assert(parts == (1 to n).map(i => s"day=$i").toSet)
    (1 to n).foreach { i =>
      assert(files(s"day=$i") == Map(s"f$i.parquet" -> i.toLong))
    }
    // compaction instant rides the metadata timeline as a commit
    val instants = graft.formats.hudi.HudiTimeline
      .listInstants(HudiMetadataTable.metadataPath(dir))
    assert(instants.exists(_.endsWith("001")))
  }

  private def physicalDataFiles(table: String): Map[String, Set[String]] = {
    val root = Paths.get(table)
    val out = scala.collection.mutable.Map.empty[String, Set[String]]
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filterNot(_.toString.contains("/.hoodie"))
      .filterNot(_.getFileName.toString.startsWith("."))
      .foreach { p =>
        val rel = root.relativize(p).toString
        val cut = rel.lastIndexOf('/')
        val part = if (cut < 0) "." else rel.substring(0, cut)
        val name = if (cut < 0) rel else rel.substring(cut + 1)
        out(part) = out.getOrElse(part, Set.empty) + name
      }
    out.toMap
  }

  test("every synced Hudi commit maintains .hoodie/metadata: listing " +
      "matches the physical files after full + incremental + row-level " +
      "writes; restore drops the table") {
    import graft.formats.hudi.{HudiConversionTarget, HudiLogFiles,
      HudiMaintenance, HudiTimeline}
    import graft.sources.ParquetDirectorySource
    import graft.sync.ConversionController

    // the reference's layout: every format overlays ONE base path, so
    // the parquet data files live inside the Hudi table dir and the
    // metadata table can index them (base/partition/name)
    val table = tmpDir("hudi_md_table")
    Files.copy(Paths.get(sf("sf0.001/region.parquet")),
      Paths.get(table, "f1.parquet"))
    Paths.get(table, "f1.parquet").toFile.setLastModified(1000000L)
    val controller = new ConversionController
    def src = new ParquetDirectorySource(spark, table, "region")
    assert(controller.sync(src,
      Seq(new HudiConversionTarget(spark, table))).head.status == "SUCCESS")

    assert(HudiMetadataTable.exists(table))
    val (_, f1) = HudiMetadataTable.readFiles(table)
    val phys1 = physicalDataFiles(table)
    assert(f1.view.mapValues(_.keySet).toMap == phys1,
      s"metadata $f1 vs physical $phys1")
    // sizes are real too
    f1.foreach { case (part, m) => m.foreach { case (name, size) =>
      val p = if (part == ".") Paths.get(table, name)
        else Paths.get(table, part, name)
      assert(size == Files.size(p), s"size drift for $part/$name")
    } }

    // incremental sync adds a second file -> second metadata commit
    Files.copy(Paths.get(sf("sf0.001/region.parquet")),
      Paths.get(table, "f2.parquet"))
    Paths.get(table, "f2.parquet").toFile.setLastModified(2000000L)
    assert(controller.sync(src,
      Seq(new HudiConversionTarget(spark, table))).head.status == "SUCCESS")
    val (_, f2) = HudiMetadataTable.readFiles(table)
    assert(f2.view.mapValues(_.keySet).toMap == physicalDataFiles(table))

    // row-level upsert writes a log file; the metadata table lists it
    val keyed = spark.read.parquet(sf("sf0.001/region.parquet"))
      .limit(1).withColumn("r_name",
        org.apache.spark.sql.functions.lit("UPDATED"))
    HudiTimeline.setProperty(table,
      HudiLogFiles.RecordKeyFieldsProp, "r_regionkey")
    HudiTimeline.setProperty(table, "hoodie.table.type", "MERGE_ON_READ")
    HudiLogFiles.upsert(spark, table, keyed, Seq("r_regionkey"))
    val (_, f3) = HudiMetadataTable.readFiles(table)
    val phys3 = physicalDataFiles(table)
    val logs3 = phys3.values.flatten.filter(_.contains(".log."))
    assert(logs3.isEmpty, "MOR logs are dot-prefixed (hidden)")
    // the upsert's log file is hidden so physicalDataFiles skips it;
    // assert directly that metadata gained a .log entry
    assert(f3.values.flatten.exists(_._1.contains(".log.")),
      s"no log file in metadata listing: $f3")

    // restore rewrites history -> metadata table is dropped, readers
    // degrade to listing
    val commits = HudiTimeline.listInstants(table)
    HudiMaintenance.restoreTo(spark, table, commits.head)
    assert(!HudiMetadataTable.exists(table))
  }
}
