package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, In, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.plans.{BloomIndex, SnapshotFileIndex}

class BloomIndexSpec extends SparkSuite {

  private def mkDelta(prefix: String, rows: DataFrame,
      nFiles: Int): String = {
    val table = tmpDir(prefix)
    graft.formats.delta.DeltaWrite.write(spark, table,
      rows.repartition(nFiles), overwrite = false)
    table
  }

  private def rows(from: Long, until: Long): DataFrame = {
    import spark.implicits._
    (from until until).map(i => (i, s"name_$i", i % 13)).toDF(
      "id", "name", "grp")
  }

  private def keptFiles(table: String, filters:
      Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Int = {
    val src = new graft.formats.delta.DeltaConversionSource(
      spark, table, "t")
    new SnapshotFileIndex(spark, src.currentSnapshot())
      .listFiles(Nil, filters).map(_.files.size).sum
  }

  private def idAttr = AttributeReference("id", LongType)()
  private def nameAttr = AttributeReference("name", StringType)()

  test("point lookup prunes files; every present key still found") {
    val table = mkDelta("bloom_basic", rows(0, 4000), 8)
    val r = BloomIndex.buildOrRefresh(spark, table, "id")
    assert(r.newlyIndexed == 8 && r.totalLive == 8)

    assert(keptFiles(table, Seq(EqualTo(idAttr, Literal(1234L)))) < 8)
    assert(keptFiles(table, Seq(In(idAttr,
      Seq(Literal(7L), Literal(999L), Literal(3777L))))) < 8)

    // no false negatives, through the real indexed read path
    val df = spark.read.format("graft").load(table)
    for (k <- Seq(0L, 1L, 1234L, 3999L))
      assert(df.filter(col("id") === k).count() == 1L, s"key $k lost")
    // absent key: zero rows, not an error
    assert(df.filter(col("id") === 999999L).count() == 0L)
  }

  test("string column index + multi-column AND prune") {
    val table = mkDelta("bloom_str", rows(0, 2000), 6)
    BloomIndex.buildOrRefresh(spark, table, "id")
    BloomIndex.buildOrRefresh(spark, table, "name")
    assert(BloomIndex.indexedColumns(spark, table) == Seq("id", "name"))
    val kept = keptFiles(table, Seq(
      EqualTo(idAttr, Literal(500L)),
      EqualTo(nameAttr, Literal.create("name_500", StringType))))
    assert(kept >= 1 && kept < 6, s"kept=$kept")
    val hit = spark.read.format("graft").load(table)
      .filter(col("id") === 500L && col("name") === "name_500")
    assert(hit.count() == 1L)
  }

  test("refresh indexes only new files; unindexed files are always kept") {
    val table = mkDelta("bloom_refresh", rows(0, 1000), 4)
    val r1 = BloomIndex.buildOrRefresh(spark, table, "id")
    assert(r1.newlyIndexed == 4)

    // new commit lands AFTER the index: its keys must still be served
    // (stale index keeps unindexed files). Probe a key that exists only
    // in the new range: min/max skipping drops the 4 old files, and the
    // 4 NEW files — absent from the index — must ALL survive the bloom
    graft.formats.delta.DeltaWrite.write(spark, table,
      rows(1000, 2000).repartition(4), overwrite = false)
    val df = spark.read.format("graft").load(table)
    assert(df.filter(col("id") === 1500L).count() == 1L)
    val keptStale = keptFiles(table, Seq(EqualTo(idAttr, Literal(1500L))))
    assert(keptStale == 4,
      s"stale index must keep all 4 unindexed files: $keptStale")

    val r2 = BloomIndex.buildOrRefresh(spark, table, "id")
    assert(r2.newlyIndexed == 4 && r2.totalLive == 8, r2.toString)
    assert(keptFiles(table, Seq(EqualTo(idAttr, Literal(1500L)))) < 4)
    assert(df.filter(col("id") === 1500L).count() == 1L)
  }

  test("refresh after OPTIMIZE drops dead entries; VACUUM spares the " +
    "index sidecar") {
    val table = mkDelta("bloom_vacuum", rows(0, 1000), 8)
    BloomIndex.buildOrRefresh(spark, table, "id")
    val res = graft.formats.delta.DeltaOptimize.compact(spark, table)
    require(res.rewrote == 8, res.toString)
    // vacuum the rewritten-away files; the index dir must survive
    graft.formats.delta.DeltaVacuum.vacuum(spark, table, 0L)
    assert(BloomIndex.indexedColumns(spark, table) == Seq("id"))

    // compacted file is unindexed → kept; refresh re-indexes it and
    // drops the 8 dead entries
    val r = BloomIndex.buildOrRefresh(spark, table, "id")
    assert(r.newlyIndexed == r.totalLive, r.toString)
    val df = spark.read.format("graft").load(table)
    assert(df.filter(col("id") === 321L).count() == 1L)
  }

  test("non-equality predicates and unindexed columns bypass the index") {
    val table = mkDelta("bloom_bypass", rows(0, 500), 4)
    BloomIndex.buildOrRefresh(spark, table, "id")
    import org.apache.spark.sql.catalyst.expressions.GreaterThan
    // range predicate: bloom can't serve it — all files kept (min/max
    // may still prune, but on hash-spread data it won't)
    assert(keptFiles(table, Seq(GreaterThan(idAttr, Literal(-1L)))) == 4)
    // unindexed column
    assert(keptFiles(table,
      Seq(EqualTo(AttributeReference("grp", LongType)(),
        Literal(3L)))) == 4)
  }

  test("prune joins stay distributed at 100k indexed files") {
    import org.apache.spark.sql.catalyst.expressions.XxHash64
    import org.apache.spark.util.sketch.BloomFilter
    import spark.implicits._
    val n = 100000
    val table = tmpDir("bloom_scale")
    val idxDir = s"$table/_graft_index/bloom/id"
    // fabricate the index executor-side: file i's bloom holds keys
    // {i}; the probe key 4242 should keep ~1 file (+fp)
    val probeHash = new XxHash64(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(4242L)))
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Long]
    spark.range(n.toLong).repartition(16).mapPartitions { it =>
      it.map { i =>
        val bf = BloomFilter.create(4096, 1L << 15)
        val h = new XxHash64(Seq(
          org.apache.spark.sql.catalyst.expressions.Literal(i)))
          .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
          .asInstanceOf[Long]
        bf.putLong(h)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (s"/tab/f$i.parquet", bos.toByteArray)
      }
    }.toDF("path", "bloom").write.parquet(s"$idxDir/v1")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(idxDir, "current"), "1".getBytes)

    val listing = spark.range(n.toLong + 10).map { i =>
      graft.model.FileEntry(
        if (i < n) s"/tab/f$i.parquet" else s"/tab/unindexed$i.parquet",
        1024L, 4096L, "parquet", Nil, Nil, 0L)
    }
    val t0 = System.nanoTime()
    val survivors = graft.plans.BloomIndex.prune(spark, listing, table,
      Seq(org.apache.spark.sql.catalyst.expressions.EqualTo(idAttr,
        org.apache.spark.sql.catalyst.expressions.Literal(4242L))),
      Seq("id")).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"100k-file bloom prune: ${survivors.length} survivors in $secs%.1fs")
    val paths = survivors.map(_.path).toSet
    assert(paths.contains("/tab/f4242.parquet"), "true key's file pruned!")
    // the 10 unindexed files are always kept; fp keeps a few more
    assert(survivors.length < 100, s"prune kept ${survivors.length}")
    assert((0 until 10).forall(k =>
      paths.contains(s"/tab/unindexed${n + k}.parquet")))
    locally { val _ = probeHash }
  }

  test("refusals: bad column names and unknown columns") {
    val table = mkDelta("bloom_refuse", rows(0, 100), 2)
    intercept[IllegalArgumentException] {
      BloomIndex.buildOrRefresh(spark, table, "no_such_col")
    }
    intercept[IllegalArgumentException] {
      BloomIndex.buildOrRefresh(spark, table, "bad/../name")
    }
  }
}
