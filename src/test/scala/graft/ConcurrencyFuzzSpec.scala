package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions.col

import graft.formats.delta._
import graft.sources.ParquetDirectorySource
import graft.sync.TableFormatSync

/** Randomized concurrency fuzz: N writer threads race mixed operations
  * (unique-key appends, unique-key deletes, compactions) against one
  * table, with NO coordination beyond the engine's own optimistic
  * concurrency. Because every op touches a DISJOINT key set, all
  * successful ops commute — the final table state is exactly
  * (seed ∪ successful appends) − successful deletes, whatever the
  * interleaving. Any lost update, double-apply, resurrected row or torn
  * commit breaks the multiset equality.
  *
  * Ops are ALLOWED to fail with the engine's loud conflict errors
  * (retries exhausted under contention); the invariant is over the ops
  * that reported success. A fixed seed keeps the schedule shape
  * reproducible; the actual interleaving is the OS scheduler's.
  */
class ConcurrencyFuzzSpec extends SparkSuite {

  private case class Outcome(kind: String, key: Long, ok: Boolean)

  test("delta: racing unique-key appends/deletes/compactions serialize") {
    val t = tmpDir("fuzz_delta")
    import spark.implicits._
    // seed keys 0..19 (one row each), via the writer surface
    val seed = spark.range(0, 20).select(col("id").as("k"),
      (col("id") * 10).as("v"))
    seed.write.format("graft").save(t)

    val nThreads = 3
    val opsPerThread = 4
    val outcomes = new ConcurrentLinkedQueue[Outcome]()
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(nThreads)
    val rnd = new scala.util.Random(41)
    // pre-plan ops so key sets are disjoint BY CONSTRUCTION:
    // appends use keys 1000+i, deletes target distinct seeded keys
    val deleteKeys = rnd.shuffle((0L until 20L).toList).take(
      nThreads * opsPerThread / 2).iterator
    val plans: Seq[Seq[(String, Long)]] = (0 until nThreads).map { tid =>
      (0 until opsPerThread).map { i =>
        val slot = tid * opsPerThread + i
        if (slot % 2 == 0) ("append", 1000L + slot)
        else if (deleteKeys.hasNext) ("delete", deleteKeys.next())
        else ("compact", -1L)
      }
    }
    plans.zipWithIndex.foreach { case (ops, tid) =>
      pool.execute { () =>
        start.await()
        ops.foreach { case (kind, key) =>
          try {
            kind match {
              case "append" =>
                spark.range(key, key + 1).select(col("id").as("k"),
                    (col("id") * 10).as("v"))
                  .write.format("graft").mode("append").save(t)
                outcomes.add(Outcome("append", key, ok = true))
              case "delete" =>
                val n = DeltaDeletes.deleteWhere(spark, t, col("k") === key)
                outcomes.add(Outcome("delete", key, ok = n == 1L))
              case "compact" =>
                DeltaOptimize.compact(spark, t)
                outcomes.add(Outcome("compact", -1L, ok = true))
            }
          } catch {
            case e: IllegalStateException
                if e.getMessage.contains("concurrent writer") ||
                  e.getMessage.contains("conflict retries") =>
              outcomes.add(Outcome(kind, key, ok = false))
            case th: Throwable => errors.add(th)
          }
        }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    assert(errors.isEmpty, errors.toString)

    import scala.jdk.CollectionConverters._
    val oc = outcomes.asScala.toSeq
    val appended = oc.filter(o => o.kind == "append" && o.ok).map(_.key)
    val deleted = oc.filter(o => o.kind == "delete" && o.ok).map(_.key)
    val expected = ((0L until 20L) ++ appended).toSet -- deleted
    val got = new DeltaConversionSource(spark, t, "t").toDataFrame
      .select("k").as[Long].collect().toSeq
    assert(got.size == got.toSet.size, "duplicate rows — a commit double-applied")
    assert(got.toSet == expected,
      s"state diverged: missing ${expected -- got.toSet}, " +
        s"extra ${got.toSet -- expected}; outcomes=$oc")
  }

  test("hudi MOR: racing disjoint-key upserts serialize under the table lock") {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    // MOR table: one base file, keyed on n_nationkey
    val dir = tmpDir("fuzz_hudi_mor")
    Files.copy(Paths.get(sf("sf0.001/nation.parquet")),
      Paths.get(dir, "base1.parquet"))
    val base = s"$dir/base1.parquet"
    val df = spark.read.parquet(base)
    graft.formats.hudi.HudiTimeline.writeProperties(dir, "nation",
      "MERGE_ON_READ")
    assert(graft.formats.hudi.HudiTimeline.writeCommit(
      graft.formats.hudi.HudiTimeline.CommitMeta("100", "commit",
        Map("" -> Seq(graft.formats.hudi.HudiTimeline.WriteStat(
          graft.formats.hudi.HudiTimeline.fileId(base),
          "base1.parquet", df.count(), Files.size(Paths.get(base))))),
        Map.empty, Map("schema" -> df.schema.json)), dir))

    // three writers upsert DISJOINT key slices concurrently; without the
    // table lock two would compute the same next log-file name and
    // interleave blocks — with it, the real-time merge must equal the
    // sequential result exactly
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(3)
    val errors = new ConcurrentLinkedQueue[Throwable]()
    (0 until 3).foreach { slice =>
      pool.execute { () =>
        start.await()
        try {
          val src = df.filter(col("n_nationkey") % 3 === slice)
            .withColumn("n_regionkey", col("n_regionkey") + 100)
          val n = graft.formats.hudi.HudiLogFiles.upsert(spark, dir, src,
            Seq("n_nationkey"))
          assert(n == src.count())
        } catch { case th: Throwable => errors.add(th) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    assert(errors.isEmpty, errors.toString)
    val rt = new graft.formats.hudi.HudiConversionSource(spark, dir,
      "nation", "snapshot").toDataFrame
    assert(rt.count() == df.count())
    // EVERY row got its slice's update — none lost to an interleave
    assert(rt.filter(col("n_regionkey") < 100).isEmpty)

    // the racing commits also maintained .hoodie/metadata (serialized
    // by the metadata lock): the files partition lists exactly the
    // physical base + every writer's log file
    val (parts, files) =
      graft.formats.hudi.HudiMetadataTable.readFiles(dir)
    assert(parts == Set("."))
    val physical = Paths.get(dir).toFile.list().toSet
      .filter(n => n == "base1.parquet" ||
        (n.startsWith(".") && n.contains(".log.") && !n.endsWith(".crc")))
    assert(files(".").keySet == physical,
      s"metadata ${files(".").keySet} vs physical $physical")
  }

  test("stream sinks: zombie replay racing itself lands EXACTLY once") {
    // two writers replay the SAME (appId, batchId) concurrently — the
    // restart-recovery shape the exactly-once claim is about. However
    // the race resolves, at most one append may land and the final row
    // count must be base + one batch. Runs per format.
    import java.util.concurrent.ConcurrentLinkedQueue
    val rows = spark.read.parquet(sf("sf0.001/nation.parquet"))

    def race(append: () => Boolean): (Int, Seq[Throwable]) = {
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(2)
      val oks = new java.util.concurrent.atomic.AtomicInteger(0)
      val errors = new ConcurrentLinkedQueue[Throwable]()
      (0 until 2).foreach { _ =>
        pool.execute { () =>
          start.await()
          try { if (append()) oks.incrementAndGet(); () }
          catch { case th: Throwable => errors.add(th) }
        }
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS))
      import scala.jdk.CollectionConverters._
      (oks.get(), errors.asScala.toSeq)
    }

    // Delta (batch 0 creates the table)
    locally {
      val t = tmpDir("zombie_delta")
      assert(DeltaStreamSink.appendBatch(spark, t, rows, "app", 0L))
      val (oks, errs) = race(() =>
        DeltaStreamSink.appendBatch(spark, t, rows, "app", 1L))
      assert(errs.isEmpty, errs.toString)
      assert(oks == 1, s"batch landed $oks times")
      assert(new DeltaConversionSource(spark, t, "t").toDataFrame
        .count() == 2 * rows.count())
    }

    def seeded(prefix: String,
        mk: (String, String) => Unit): String = {
      val seed = tmpDir(s"${prefix}_seed")
      rows.write.mode("overwrite").parquet(seed)
      val t = tmpDir(prefix)
      mk(seed, t)
      t
    }
    def syncTo(tgt: graft.spi.ConversionTarget)(seed: String): Unit = {
      val src = new ParquetDirectorySource(spark, seed, "t")
      val o = TableFormatSync.syncSnapshot(Seq(tgt),
        src.currentSnapshot(), src.sourceFormat)
      assert(o.forall(_.status == "SUCCESS"), o.mkString(";"))
    }

    // Iceberg
    locally {
      val t = seeded("zombie_ice", (seed, t) =>
        syncTo(new graft.formats.iceberg.IcebergConversionTarget(spark, t))(seed))
      val (oks, errs) = race(() => graft.formats.iceberg.IcebergStreamSink
        .appendBatch(spark, t, rows, "app", 0L))
      assert(errs.isEmpty, errs.toString)
      assert(oks == 1, s"batch landed $oks times")
      assert(new graft.formats.iceberg.IcebergConversionSource(spark, t, "t")
        .toDataFrame.count() == 2 * rows.count())
    }

    // Hudi
    locally {
      val t = seeded("zombie_hudi", (seed, t) =>
        syncTo(new graft.formats.hudi.HudiConversionTarget(spark, t))(seed))
      val (oks, errs) = race(() => graft.formats.hudi.HudiStreamSink
        .appendBatch(spark, t, rows, "app", 0L))
      assert(errs.isEmpty, errs.toString)
      assert(oks == 1, s"batch landed $oks times")
      assert(new graft.formats.hudi.HudiConversionSource(spark, t, "t")
        .toDataFrame.count() == 2 * rows.count())
    }

    // Paimon
    locally {
      val t = seeded("zombie_paimon", (seed, t) =>
        syncTo(new graft.formats.paimon.PaimonConversionTarget(spark, t))(seed))
      val (oks, errs) = race(() => graft.formats.paimon.PaimonStreamSink
        .appendBatch(spark, t, rows, "app", 0L))
      assert(errs.isEmpty, errs.toString)
      assert(oks == 1, s"batch landed $oks times")
      assert(new graft.formats.paimon.PaimonConversionSource(spark, t, "t")
        .toDataFrame.count() == 2 * rows.count())
    }
  }

  test("iceberg v3: racing blind appends, DV deletes and a compaction " +
    "serialize without forking row lineage") {
    val t = tmpDir("fuzz_icev3")
    import spark.implicits._
    val seedDir = tmpDir("fuzz_icev3_seed")
    spark.range(0, 20).select(col("id").as("k"), (col("id") * 10).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(seedDir)
    val src = new ParquetDirectorySource(spark, seedDir, "t")
    val out = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, t)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))
    assert(graft.formats.iceberg.IcebergDeletes.upgradeToV3(spark, t))

    val nThreads = 3
    val outcomes = new ConcurrentLinkedQueue[Outcome]()
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(nThreads)
    (0 until nThreads).foreach { tid =>
      pool.execute { () =>
        start.await()
        (0 until 3).foreach { i =>
          val slot = tid * 3 + i
          try {
            if (slot == 4) {
              // lineage-preserving compaction mid-race
              graft.formats.iceberg.IcebergDeletes
                .rewriteWithDeletes(spark, t, zorderBy = Seq("k"))
              outcomes.add(Outcome("replace", -1L, ok = true))
            } else if (slot == 1 || slot == 5 || slot == 7) {
              // DV delete of a seed key (distinct per slot)
              val n = graft.formats.iceberg.IcebergDeletes
                .deleteWhere(spark, t, col("k") === slot.toLong)
              outcomes.add(Outcome("delete", slot.toLong, ok = n == 1L))
            } else {
              val key = 1000L + slot
              val d = tmpDir(s"fuzz_icev3_add_$slot")
              spark.range(key, key + 1).select(col("id").as("k"),
                  (col("id") * 10).as("v"))
                .coalesce(1).write.mode("overwrite").parquet(d)
              graft.formats.iceberg.IcebergDeletes.appendDataFiles(spark, t, d)
              outcomes.add(Outcome("append", key, ok = true))
            }
          } catch {
            case e: IllegalStateException
                if e.getMessage.contains("concurrent writer") =>
              outcomes.add(Outcome("op", -1L, ok = false))
            case e: IllegalArgumentException
                if e.getMessage.contains("non-live") =>
              // DV victims planned against files a racing compaction
              // rewrote: the commit refuses rather than masking
              // positions of dead files — not applied
              outcomes.add(Outcome("op", -1L, ok = false))
            case th: Throwable => errors.add(th)
          }
        }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    assert(errors.isEmpty, errors.toString)

    import scala.jdk.CollectionConverters._
    val appended = outcomes.asScala
      .filter(o => o.kind == "append" && o.ok).map(_.key).toSet
    val deleted = outcomes.asScala
      .filter(o => o.kind == "delete" && o.ok).map(_.key).toSet
    val expected = ((0L until 20L).toSet -- deleted) ++ appended
    val m = graft.formats.iceberg.IcebergMetadata.read(t,
      graft.formats.iceberg.IcebergMetadata.currentVersion(t).get)
    assert(m.formatVersion == 3)
    // at most one live DV per data file survived the race
    val refs = graft.formats.iceberg.IcebergDeletes
      .liveDeleteRefs(m, m.headSequence).filter(_.isDeletionVector)
    assert(refs.map(_.referencedDataFile.get).distinct.size == refs.size,
      s"merge rule violated under race: $refs")
    val got = new graft.formats.iceberg.IcebergConversionSource(
      spark, t, "t").toDataFrame.select("k").as[Long].collect().toSeq
    assert(got.size == got.toSet.size, "duplicate rows — double-applied")
    assert(got.toSet == expected,
      s"state diverged: missing ${expected -- got.toSet}, " +
        s"extra ${got.toSet -- expected}")
    // row lineage never forks: every served id is distinct
    val ids = spark.read.format("graft")
      .option("withRowLineage", "true").load(t)
      .select("_row_id").collect().map(_.getLong(0))
    assert(ids.length == expected.size && ids.distinct.length == ids.length,
      s"forked/dropped lineage: ${ids.length} ids, " +
        s"${ids.distinct.length} distinct")
  }

  test("iceberg: racing unique-key appends and a clustered replace serialize") {
    val t = tmpDir("fuzz_ice")
    import spark.implicits._
    val seedDir = tmpDir("fuzz_ice_seed")
    spark.range(0, 20).select(col("id").as("k"), (col("id") * 10).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(seedDir)
    val src = new ParquetDirectorySource(spark, seedDir, "t")
    val out = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(spark, t)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"), out.mkString(";"))

    val nThreads = 3
    val outcomes = new ConcurrentLinkedQueue[Outcome]()
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(nThreads)
    (0 until nThreads).foreach { tid =>
      pool.execute { () =>
        start.await()
        (0 until 3).foreach { i =>
          val slot = tid * 3 + i
          try {
            if (slot == 4) {   // one clustered REPLACE mid-race
              graft.formats.iceberg.IcebergDeletes.rewriteWithDeletes(
                spark, t, zorderBy = Seq("k"))
              outcomes.add(Outcome("replace", -1L, ok = true))
            } else {
              val key = 1000L + slot
              val d = tmpDir(s"fuzz_ice_add_$slot")
              spark.range(key, key + 1).select(col("id").as("k"),
                  (col("id") * 10).as("v"))
                .coalesce(1).write.mode("overwrite").parquet(d)
              graft.formats.iceberg.IcebergDeletes.appendDataFiles(spark, t, d)
              outcomes.add(Outcome("append", key, ok = true))
            }
          } catch {
            case e: IllegalStateException
                if e.getMessage.contains("concurrent writer") =>
              outcomes.add(Outcome("op", -1L, ok = false))
            case th: Throwable => errors.add(th)
          }
        }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    assert(errors.isEmpty, errors.toString)

    import scala.jdk.CollectionConverters._
    val appended = outcomes.asScala
      .filter(o => o.kind == "append" && o.ok).map(_.key).toSet
    val expected = (0L until 20L).toSet ++ appended
    val got = new graft.formats.iceberg.IcebergConversionSource(
      spark, t, "t").toDataFrame.select("k").as[Long].collect().toSeq
    assert(got.size == got.toSet.size, "duplicate rows — double-applied")
    assert(got.toSet == expected,
      s"state diverged: missing ${expected -- got.toSet}, " +
        s"extra ${got.toSet -- expected}")
  }

  test("delta row tracking: racing appends, a DV delete and an OPTIMIZE " +
    "never double-assign or fork row ids") {
    import spark.implicits._
    val t = tmpDir("fuzz_deltart")
    DeltaWrite.write(spark, t,
      spark.range(0, 20).select(col("id").as("k"),
        (col("id") * 10).as("v")).repartition(2), overwrite = false)
    DeltaRowTracking.enable(spark, t)

    val nThreads = 3
    val outcomes = new ConcurrentLinkedQueue[Outcome]()
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(nThreads)
    (0 until nThreads).foreach { tid =>
      pool.execute { () =>
        start.await()
        (0 until 3).foreach { i =>
          val slot = tid * 3 + i
          try {
            if (slot == 4) {
              DeltaOptimize.compact(spark, t,
                targetFileBytes = 1L << 30, minFileBytes = 1L << 20)
              outcomes.add(Outcome("optimize", -1L, ok = true))
            } else if (slot == 1 || slot == 7) {
              val n = DeltaDeletes.deleteWhere(spark, t,
                col("k") === slot.toLong)
              outcomes.add(Outcome("delete", slot.toLong, ok = n == 1L))
            } else {
              val key = 1000L + slot
              DeltaWrite.write(spark, t,
                Seq((key, key * 10)).toDF("k", "v"), overwrite = false)
              outcomes.add(Outcome("append", key, ok = true))
            }
          } catch {
            // id-assigning commits CAS strictly — losers fail loudly
            // and report not-applied, never silently re-land
            case e: IllegalStateException
                if e.getMessage.contains("concurrent writer") =>
              outcomes.add(Outcome("op", -1L, ok = false))
            case th: Throwable => errors.add(th)
          }
        }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS))
    assert(errors.isEmpty, errors.toString)

    import scala.jdk.CollectionConverters._
    val appended = outcomes.asScala
      .filter(o => o.kind == "append" && o.ok).map(_.key).toSet
    val deleted = outcomes.asScala
      .filter(o => o.kind == "delete" && o.ok).map(_.key).toSet
    val expected = ((0L until 20L).toSet -- deleted) ++ appended
    val lin = spark.read.format("graft")
      .option("withRowLineage", "true").load(t)
      .select(col("k"), col("_row_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lin.map(_._1).toSet == expected,
      s"state diverged: missing ${expected -- lin.map(_._1).toSet}, " +
        s"extra ${lin.map(_._1).toSet -- expected}")
    // the hard invariant: no interleaving may hand out an id twice
    assert(lin.map(_._2).distinct.length == lin.length,
      s"double-assigned row ids: ${lin.groupBy(_._2)
        .filter(_._2.length > 1)}")
    // survivors of the seed keep ids in the backfilled range
    assert(lin.filter(_._1 < 20L).forall(_._2 < 20L), lin.mkString(","))
    // and the high-water mark is at or past every served id
    val versions = DeltaLog.listVersions(t,
      graft.util.HadoopConfs.session(spark))
    assert(DeltaRowTracking.highWaterMark(spark, t, versions) >=
      lin.map(_._2).max)
  }
}
