package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.formats.hudi._

/** Hudi MERGE_ON_READ real-time view: log-file codec round-trip, upsert
  * routing, merged reads (latest instant wins), and the RO/compaction
  * interplay. Reference behavior: ITHudiConversionSource real-time
  * assertions (`hoodie.datasource.query.type=snapshot`).
  */
class HudiMorSpec extends SparkSuite {

  import spark.implicits._

  /** A MOR table with nation as its single base file at instant 100. */
  private def morTable(): String = {
    val dir = tmpDir("hudi_rt")
    Files.copy(Paths.get(sf("sf0.001/nation.parquet")),
      Paths.get(dir, "base1.parquet"))
    val base = s"$dir/base1.parquet"
    val df = spark.read.parquet(base)
    HudiTimeline.writeProperties(dir, "nation", "MERGE_ON_READ")
    assert(HudiTimeline.writeCommit(HudiTimeline.CommitMeta("100", "commit",
      Map("" -> Seq(HudiTimeline.WriteStat(HudiTimeline.fileId(base),
        "base1.parquet", df.count(), Files.size(Paths.get(base))))),
      Map.empty, Map("schema" -> df.schema.json)), dir))
    dir
  }

  test("log block container round-trips avro records across appends") {
    val dir = tmpDir("hudi_log_codec")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    val avro = graft.model.AvroSchemas.fromSpark(schema)
    val conf = new org.apache.hadoop.conf.Configuration()
    val path = s"$dir/.g1_100.log.1_0-1-1"
    def rec(k: Long, s: String) = HudiLogFiles.rowToRecord(
      org.apache.spark.sql.Row(k, s), schema, avro)
    val (n1, _) = HudiLogFiles.writeLogFile(conf, path, avro, "200",
      Iterator(rec(1, "a"), rec(2, "b")))
    // append a second block to the SAME file at a later instant
    val (n2, _) = HudiLogFiles.writeLogFile(conf, path, avro, "300",
      Iterator(rec(2, "b2")))
    assert(n1 == 2 && n2 == 1)
    val got = HudiLogFiles.readLogFile(conf, path)
      .map { case (i, r, _) => (i, r.get("k"), r.get("s").toString) }
    assert(got == Seq(("200", 1L, "a"), ("200", 2L, "b"), ("300", 2L, "b2")))

    // truncated tail block: parsed prefix still serves (crash tolerance).
    // nio truncation bypasses the checksum sidecar — drop it like the
    // out-of-band corruption it simulates.
    val raw = Files.readAllBytes(Paths.get(path))
    Files.write(Paths.get(path), raw.dropRight(8))
    Files.deleteIfExists(Paths.get(s"$dir/..g1_100.log.1_0-1-1.crc"))
    assert(HudiLogFiles.readLogFile(conf, path).size == 2)
  }

  test("delete-block keys: delimiter values refused on write, malformed loud on read") {
    val dir = tmpDir("hudi_log_delkeys")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType)))
    val avro = graft.model.AvroSchemas.fromSpark(schema)
    val conf = new org.apache.hadoop.conf.Configuration()
    def rec(k: String) = HudiLogFiles.rowToRecord(
      org.apache.spark.sql.Row(k), schema, avro)

    // a key VALUE holding the wire delimiters cannot round-trip through
    // Hudi's complex-key form — the writer must refuse, not corrupt
    Seq("a,b", "a:b").foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        HudiLogFiles.writeLogFile(conf, s"$dir/.bad_100.log.1_0-1-1",
          avro, "200", Iterator(rec(bad)), HudiLogFiles.DeleteBlock)
      }
      assert(e.getMessage.contains("record-key"), e.getMessage)
    }

    // clean values round-trip as tombstones in complex field:value form
    val path = s"$dir/.ok_100.log.1_0-1-1"
    HudiLogFiles.writeLogFile(conf, path, avro, "200",
      Iterator(rec("x1"), rec("x2")), HudiLogFiles.DeleteBlock)
    val got = HudiLogFiles.readLogFile(conf, path)
    assert(got.forall(_._3) && got.map(_._2.get("k").toString) ==
      Seq("x1", "x2"))
  }

  test("upsert writes log files; real-time merges, RO view unchanged") {
    val dir = morTable()
    val nation = spark.read.parquet(sf("sf0.001/nation.parquet"))
    val keys = nation.select("n_nationkey").as[Long].collect().toSeq
    val source = nation.filter(col("n_nationkey") % 3 === 0)
      .withColumn("n_regionkey", col("n_regionkey") + 100)
      .unionByName(nation.filter(col("n_nationkey") % 5 === 0)
        .withColumn("n_nationkey", col("n_nationkey") + 500))
    val n = HudiLogFiles.upsert(spark, dir, source, Seq("n_nationkey"))
    assert(n == source.count())

    // read-optimized view: base rows only, untouched
    val ro = new HudiConversionSource(spark, dir, "nation")
    assert(ro.toDataFrame.select("n_nationkey").as[Long].collect().sorted
      .toSeq == keys.sorted)

    // real-time view: merged
    val rt = new HudiConversionSource(spark, dir, "nation", "snapshot")
    val got = rt.toDataFrame.select("n_nationkey", "n_regionkey")
      .as[(Long, Long)].collect().toMap
    val regions = nation.select("n_nationkey", "n_regionkey")
      .as[(Long, Long)].collect().toMap
    assert(got.size == keys.size + keys.count(_ % 5 == 0))
    for ((k, r) <- regions)
      assert(got(k) == (if (k % 3 == 0) r + 100 else r), s"key $k")
    for (k <- keys if k % 5 == 0) assert(got(k + 500) == regions(k))

    // second upsert at a later instant wins over the first
    val n2 = HudiLogFiles.upsert(spark, dir,
      nation.filter(col("n_nationkey") === 3)
        .withColumn("n_regionkey", lit(77L)), Seq("n_nationkey"))
    assert(n2 == 1L)
    val got2 = new HudiConversionSource(spark, dir, "nation", "snapshot")
      .toDataFrame.select("n_nationkey", "n_regionkey")
      .as[(Long, Long)].collect().toMap
    assert(got2(3L) == 77L)
    assert(got2.size == got.size)

    // file-level surfaces still refuse the real-time snapshot while logs
    // are pending (a listing cannot represent a merge)
    intercept[UnsupportedOperationException](rt.currentSnapshot())

    // key-mismatch refusal: the table's pinned record key is authoritative
    intercept[IllegalArgumentException](
      HudiLogFiles.upsert(spark, dir, source, Seq("n_regionkey")))
  }

  test("compaction absorbs logs: real-time == read-optimized again") {
    val dir = morTable()
    val nation = spark.read.parquet(sf("sf0.001/nation.parquet"))
    HudiLogFiles.upsert(spark, dir,
      nation.filter(col("n_nationkey") === 1)
        .withColumn("n_regionkey", lit(50L)), Seq("n_nationkey"))
    // compaction: merged rows land as a NEW base file for the group
    val merged = new HudiConversionSource(spark, dir, "nation", "snapshot")
      .toDataFrame
    val stage = tmpDir("hudi_rt_compact") + "/t"
    merged.repartition(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val compacted = s"$dir/base1_c.parquet"
    Files.move(part.toPath, Paths.get(compacted))
    val fid = HudiTimeline.fileId(s"$dir/base1.parquet")
    val instant = HudiTimeline.newInstant(dir)
    assert(HudiTimeline.writeCommit(HudiTimeline.CommitMeta(instant,
      "commit", Map("" -> Seq(HudiTimeline.WriteStat(fid, "base1_c.parquet",
        merged.count(), Files.size(Paths.get(compacted))))),
      Map.empty, Map("schema" -> nation.schema.json)), dir))

    val rt = new HudiConversionSource(spark, dir, "nation", "snapshot")
    // logs absorbed: snapshot serves from files again, no merge needed
    assert(rt.currentSnapshot().files.collect()
      .map(_.path.split('/').last).toSeq == Seq("base1_c.parquet"))
    val got = rt.toDataFrame.select("n_nationkey", "n_regionkey")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 50L)
    assert(got.size == nation.count().toInt)
  }

  test("deleteWhere tombstones: delete, revive, delete of log-only insert") {
    val dir = morTable()
    val nation = spark.read.parquet(sf("sf0.001/nation.parquet"))
    val keys = nation.select("n_nationkey").as[Long].collect().toSeq.sorted
    // insert a log-only key (not in any base file)
    HudiLogFiles.upsert(spark, dir,
      nation.filter(col("n_nationkey") === 1)
        .withColumn("n_nationkey", lit(9999L)), Seq("n_nationkey"))

    // delete even keys (hits base rows AND the log-only 9999? no — odd)
    val nDel = HudiLogFiles.deleteWhere(spark, dir,
      col("n_nationkey") % 2 === 0)
    assert(nDel == keys.count(_ % 2 == 0))
    val rt = new HudiConversionSource(spark, dir, "nation", "snapshot")
    val afterDel = rt.toDataFrame.select("n_nationkey").as[Long]
      .collect().sorted.toSeq
    assert(afterDel == (keys.filter(_ % 2 != 0) :+ 9999L).sorted)

    // delete the log-only insert: routing falls back to the first group
    assert(HudiLogFiles.deleteWhere(spark, dir,
      col("n_nationkey") === 9999L) == 1L)
    assert(!new HudiConversionSource(spark, dir, "nation", "snapshot")
      .toDataFrame.select("n_nationkey").as[Long].collect().contains(9999L))

    // revive: a LATER upsert of a deleted key wins over the tombstone
    HudiLogFiles.upsert(spark, dir,
      nation.filter(col("n_nationkey") === 2)
        .withColumn("n_regionkey", lit(42L)), Seq("n_nationkey"))
    val revived = new HudiConversionSource(spark, dir, "nation", "snapshot")
      .toDataFrame.select("n_nationkey", "n_regionkey")
      .as[(Long, Long)].collect().toMap
    assert(revived(2L) == 42L)
    assert(!revived.contains(4L), "still-deleted key must stay gone")

    // RO view never saw any of it
    assert(new HudiConversionSource(spark, dir, "nation").toDataFrame
      .select("n_nationkey").as[Long].collect().sorted.toSeq == keys)
  }

  test("compact() absorbs upserts + tombstones; file surfaces serve again") {
    val dir = morTable()
    val nation = spark.read.parquet(sf("sf0.001/nation.parquet"))
    val keys = nation.select("n_nationkey").as[Long].collect().toSeq
    HudiLogFiles.upsert(spark, dir,
      nation.filter(col("n_nationkey") % 3 === 0)
        .withColumn("n_regionkey", col("n_regionkey") + 100),
      Seq("n_nationkey"))
    HudiLogFiles.deleteWhere(spark, dir, col("n_nationkey") % 2 === 0)

    val expect = new HudiConversionSource(spark, dir, "nation", "snapshot")
      .toDataFrame.select("n_nationkey", "n_regionkey")
      .as[(Long, Long)].collect().toMap
    val n = HudiLogFiles.compact(spark, dir)
    assert(n == expect.size.toLong)

    // RO == RT now, and the file-level snapshot serves without refusal
    val ro = new HudiConversionSource(spark, dir, "nation")
    val got = ro.toDataFrame.select("n_nationkey", "n_regionkey")
      .as[(Long, Long)].collect().toMap
    assert(got == expect)
    val snapFiles = ro.currentSnapshot().files.collect()
    assert(snapFiles.forall(f => !HudiTimeline.isLogFile(f.path)))
    assert(got.keySet == keys.filter(_ % 2 != 0).toSet)

    // a second compact is a no-op (no live logs)
    assert(HudiLogFiles.compact(spark, dir) == 0L)
  }

  test("clean() retires superseded bases and absorbed logs, views intact") {
    val dir = morTable()
    val nation = spark.read.parquet(sf("sf0.001/nation.parquet"))
    HudiLogFiles.upsert(spark, dir,
      nation.filter(col("n_nationkey") % 3 === 0)
        .withColumn("n_regionkey", col("n_regionkey") + 100),
      Seq("n_nationkey"))
    HudiLogFiles.deleteWhere(spark, dir, col("n_nationkey") % 2 === 0)
    assert(HudiLogFiles.compact(spark, dir) > 0)
    val want = new HudiConversionSource(spark, dir, "nation")
      .toDataFrame.select("n_nationkey", "n_regionkey")
      .as[(Long, Long)].collect().toMap

    def dataFiles() = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .map(_.getName).toSet
    val before = dataFiles()
    assert(before.contains("base1.parquet"))

    // nothing is cleanable while every instant is retained
    val wide = HudiMaintenance.clean(spark, dir, retainInstants = 99)
    assert(wide.deleted == 0L)

    val res = HudiMaintenance.clean(spark, dir, retainInstants = 1)
    // the original base (superseded by compaction) + the absorbed logs
    assert(res.deleted >= 2, res.toString)
    val after = dataFiles()
    assert(!after.contains("base1.parquet"),
      "superseded base must be cleaned")
    // log files live under the partition dir too (dot-prefixed) — check
    // via the walk the cleaner itself reports
    assert(before.size - after.size >= 1)

    // the .clean instant landed and the fold still serves correct rows
    val hoodie = new java.io.File(dir, ".hoodie").listFiles()
      .map(_.getName)
    assert(hoodie.exists(_.endsWith(".clean")), hoodie.mkString(","))
    val got = new HudiConversionSource(spark, dir, "nation")
      .toDataFrame.select("n_nationkey", "n_regionkey")
      .as[(Long, Long)].collect().toMap
    assert(got == want, "clean changed the served rows")
    // a second clean finds nothing
    assert(HudiMaintenance.clean(spark, dir, retainInstants = 1)
      .deleted == 0L)

    // incremental-sync safety honors the clean horizon: resuming from a
    // commit BEFORE it would reference the deleted files, so the source
    // must demand a full sync there while staying incremental at/after
    val horizons = HudiTimeline.cleanHorizons(dir)
    assert(horizons.nonEmpty && horizons.forall(_ == res.earliestRetained),
      horizons.toString)
    val src = new HudiConversionSource(spark, dir, "nation")
    val instants = HudiTimeline.listInstants(dir)
    val preHorizon = instants.filter(_ < res.earliestRetained)
    assert(preHorizon.nonEmpty, instants.toString)
    assert(!src.isIncrementalSyncSafeFrom(preHorizon.head),
      "resume before the clean horizon must force a full sync")
    assert(src.isIncrementalSyncSafeFrom(instants.last))
  }

  test("compact() replaces a fully-deleted file group") {
    val dir = morTable()
    HudiLogFiles.upsert(spark, dir,
      spark.read.parquet(sf("sf0.001/nation.parquet"))
        .filter(col("n_nationkey") === 1)
        .withColumn("n_regionkey", lit(50L)), Seq("n_nationkey"))
    // delete EVERYTHING: the sole group empties and must be replaced,
    // not rewritten as an empty base file
    HudiLogFiles.deleteWhere(spark, dir, lit(true))
    assert(HudiLogFiles.compact(spark, dir) == 0L ||
      new HudiConversionSource(spark, dir, "nation").toDataFrame.count() == 0L)
    val ro = new HudiConversionSource(spark, dir, "nation")
    assert(ro.toDataFrame.count() == 0L)
    assert(ro.currentSnapshot().files.collect().isEmpty)
  }

  test("incremental read refuses deltacommit ranges, serves after compact") {
    import org.apache.spark.sql.functions._
    val dir = morTable()
    val nation = spark.read.parquet(sf("sf0.001/nation.parquet"))
    HudiLogFiles.upsert(spark, dir,
      nation.filter(col("n_nationkey") < 3)
        .withColumn("n_regionkey", lit(9)), Seq("n_nationkey"))
    // a log-write instant sits in the range: refuse, never under-report
    val e = intercept[IllegalArgumentException] {
      graft.formats.hudi.HudiChanges
        .incrementalRead(spark, dir, "100", "99999999999999999").count()
    }
    assert(e.getMessage.contains("deltacommit"))
    // after compaction the range is base-file only again — the feed is
    // the compacted group (it supersedes the original in-range)
    assert(HudiLogFiles.compact(spark, dir) > 0)
    val feed = graft.formats.hudi.HudiChanges
      .incrementalRead(spark, dir, "100", "99999999999999999")
    assert(feed.count() == nation.count())
    assert(feed.filter(col("n_regionkey") === 9).count() == 3)
    assert(feed.select("_commit_instant").distinct().count() == 1)
    // empty range → empty feed with the right schema
    val empty = graft.formats.hudi.HudiChanges
      .incrementalRead(spark, dir, "99999999999999999",
        "99999999999999999")
    assert(empty.count() == 0 &&
      empty.columns.contains("_commit_instant"))
  }

  test("updateWhere rewrites matching rows as keyed log upserts") {
    val dir = morTable()
    val nation = spark.read.parquet(sf("sf0.001/nation.parquet"))
    // pin the record key via a first upsert
    HudiLogFiles.upsert(spark, dir,
      nation.where("n_nationkey = 2"), Seq("n_nationkey"))
    val n = HudiLogFiles.updateWhere(spark, dir,
      col("n_regionkey") === 1,
      Map("n_name" -> org.apache.spark.sql.functions.lit("RENAMED")))
    val expect = nation.where("n_regionkey = 1").count()
    assert(n == expect && n > 0)
    val rt = new HudiConversionSource(spark, dir, "nation", "snapshot")
      .toDataFrame
    assert(rt.count() == nation.count())
    assert(rt.where("n_name = 'RENAMED'").count() == expect)
    assert(rt.where("n_regionkey = 1 AND n_name <> 'RENAMED'").count() == 0)
    // key columns are not updatable
    intercept[IllegalArgumentException] {
      HudiLogFiles.updateWhere(spark, dir, col("n_regionkey") === 1,
        Map("n_nationkey" -> org.apache.spark.sql.functions.lit(99L)))
    }
  }
  test("upsert refuses duplicate source keys inside the write pass, " +
    "before any commit lands") {
    import spark.implicits._
    val t = tmpDir("hudi_dupkeys")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf("sf0.001/nation.parquet")),
      java.nio.file.Paths.get(t, "base1.parquet"))
    val base = s"$t/base1.parquet"
    val nation = spark.read.parquet(base)
    graft.formats.hudi.HudiTimeline.writeProperties(t, "nation",
      "MERGE_ON_READ")
    require(graft.formats.hudi.HudiTimeline.writeCommit(
      graft.formats.hudi.HudiTimeline.CommitMeta("100", "commit",
        Map("" -> Seq(graft.formats.hudi.HudiTimeline.WriteStat(
          graft.formats.hudi.HudiTimeline.fileId(base), "base1.parquet",
          nation.count(),
          java.nio.file.Files.size(java.nio.file.Paths.get(base))))),
        Map.empty, Map("schema" -> nation.schema.json)), t))
    val dup = nation.limit(1).unionByName(nation.limit(1))
    val e = intercept[Exception] {
      graft.formats.hudi.HudiLogFiles.upsert(spark, t, dup,
        Seq("n_nationkey"))
    }
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + "|" + msgs(x.getCause)
    assert(msgs(e).contains("duplicate keys"), msgs(e))
    // the aborted write left no commit: the timeline is untouched and
    // the real-time read serves exactly the base rows
    assert(graft.formats.hudi.HudiTimeline.listInstants(t) == Seq("100"))
    assert(new graft.formats.hudi.HudiConversionSource(
      spark, t, "nation", "snapshot").toDataFrame.count() == nation.count())
    locally { val _ = spark.implicits }
  }

  test("rollback instants: not data commits; a retracted synced instant " +
    "forces full resync; unparseable bodies are conservative") {
    val dir = morTable()
    HudiLogFiles.upsert(spark, dir,
      spark.read.parquet(sf("sf0.001/nation.parquet"))
        .filter(col("n_nationkey") < 3)
        .withColumn("n_regionkey", col("n_regionkey") + 50),
      Seq("n_nationkey"))
    val instants = HudiTimeline.listInstants(dir)
    assert(instants.size == 2)
    val Seq(i1, i2) = instants
    val src0 = new HudiConversionSource(spark, dir, "nation")
    assert(src0.isIncrementalSyncSafeFrom(i1))
    val rowsBefore = src0.toDataFrame.count()

    // an EXTERNAL writer's rollback (legacy-layout name, JSON body with
    // the avro metadata's field): retracts the upsert instant i2
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, ".hoodie", "900.rollback"),
      s"""{"commitsRollback":["$i2"]}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(HudiTimeline.rollbackTargets(dir) == Seq(i2))
    // not a commit: the timeline and the served rows are unchanged
    assert(HudiTimeline.listInstants(dir) == instants)
    assert(new HudiConversionSource(spark, dir, "nation")
      .toDataFrame.count() == rowsBefore)
    // a sync that resumed BEFORE the retracted instant never shipped it
    // -> safe; resuming AT or AFTER it means shipped state was
    // retracted -> full resync
    val src = new HudiConversionSource(spark, dir, "nation")
    assert(src.isIncrementalSyncSafeFrom(i1))
    assert(!src.isIncrementalSyncSafeFrom(i2))

    // an unparseable rollback body must be conservative (full resync
    // from anywhere), never unsafe-open
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, ".hoodie", "901.rollback"),
      "not json".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val src2 = new HudiConversionSource(spark, dir, "nation")
    assert(!src2.isIncrementalSyncSafeFrom(i1))
    assert(!src2.isIncrementalSyncSafeFrom(i2))
  }
}
