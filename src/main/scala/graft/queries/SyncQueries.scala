package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.formats.delta._
import graft.sources.ParquetDirectorySource
import graft.sync.{ConversionController, TableFormatSync}

/** End-to-end sync conversions surfaced as driver-gate queries: convert the
  * metadata plane, read the converted table back through the engine, and
  * aggregate — the reference's own correctness contract (source and target
  * must read row-identical, ITConversionController.java:950-1027) with
  * DuckDB as the independent oracle.
  */
object SyncQueries {

  /** Parquet dir → Delta (full snapshot), read back via the Delta source. */
  def syncParquetToDelta(s: SparkSession, dir: String): DataFrame = {
    val target = graft.util.TempDirs.create("graft_delta_li")
    val src = new ParquetDirectorySource(s, s"$dir/lineitem.parquet", "lineitem")
    val tgt = new DeltaConversionTarget(s, target)
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(tgt), src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    new DeltaConversionSource(s, target, "lineitem").toDataFrame
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("cnt"),
        Gate.sumMeasure(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag")
  }

  val syncParquetToDeltaSql: String =
    """SELECT l_returnflag, count(*) AS cnt,
      |  CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Incremental file-level CDC: full sync one file, add a second, replay
    * only the new commit, read the union back (values are exactly 2× the
    * source table).
    */
  def syncIncrementalDelta(s: SparkSession, dir: String): DataFrame = {
    val dataDir = graft.util.TempDirs.create("graft_inc_data")
    val target = graft.util.TempDirs.create("graft_inc_delta")
    val srcFile = Paths.get(s"$dir/supplier.parquet")
    Files.copy(srcFile, Paths.get(dataDir, "f1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Paths.get(dataDir, "f1.parquet").toFile.setLastModified(1000000L)
    val controller = new ConversionController
    def src = new ParquetDirectorySource(s, dataDir, "supplier")
    val r1 = controller.sync(src, Seq(new DeltaConversionTarget(s, target)))
    require(r1.forall(_.status == "SUCCESS"), r1.mkString(";"))
    Files.copy(srcFile, Paths.get(dataDir, "f2.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Paths.get(dataDir, "f2.parquet").toFile.setLastModified(2000000L)
    val r2 = controller.sync(src, Seq(new DeltaConversionTarget(s, target)))
    require(r2.forall(o => o.status == "SUCCESS" && o.mode == "INCREMENTAL"),
      r2.mkString(";"))
    new DeltaConversionSource(s, target, "supplier").toDataFrame
      .agg(
        count(lit(1)).as("cnt"),
        Gate.sumMeasure(col("s_acctbal")).as("sum_bal"),
        countDistinct(col("s_suppkey")).as("distinct_keys"))
  }

  val syncIncrementalDeltaSql: String =
    """SELECT 2*count(*) AS cnt,
      |  CAST(CAST(2*sum(CAST(CAST(s_acctbal AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_bal,
      |  count(DISTINCT s_suppkey) AS distinct_keys
      |FROM supplier""".stripMargin

  /** Incremental sync with HUDI as the SOURCE (reference parameterizes
    * source format × sync mode, ITConversionController.java:227-318):
    * timeline replay across two new instants — a plain commit (add) and a
    * replacecommit (remove + add) — into a Delta target that already holds
    * a full sync. Final live set = f2 + f3, so every aggregate is exactly
    * 2× the source table and distinct keys prove the remove replayed.
    */
  def syncIncrementalHudi(s: SparkSession, dir: String): DataFrame = {
    val dataDir = graft.util.TempDirs.create("graft_inch_data")
    val hudiDir = graft.util.TempDirs.create("graft_inch_hudi")
    val deltaDir = graft.util.TempDirs.create("graft_inch_delta")
    val srcFile = Paths.get(s"$dir/nation.parquet")
    def addFile(name: String, mtime: Long): Unit = {
      Files.copy(srcFile, Paths.get(dataDir, name),
        StandardCopyOption.REPLACE_EXISTING)
      Paths.get(dataDir, name).toFile.setLastModified(mtime)
    }
    def psrc = new ParquetDirectorySource(s, dataDir, "nation")
    val hudiTgt = new graft.formats.hudi.HudiConversionTarget(s, hudiDir)
    def hudiCommit(): Unit = {
      val o = TableFormatSync.syncSnapshot(Seq(hudiTgt),
        psrc.currentSnapshot(), psrc.sourceFormat)
      require(o.forall(_.status == "SUCCESS"), o.mkString(";"))
    }
    addFile("f1.parquet", 1000000L)
    hudiCommit()                                   // instant A: commit(f1)
    def hsrc = new graft.formats.hudi.HudiConversionSource(s, hudiDir, "nation")
    val controller = new ConversionController
    val r1 = controller.sync(hsrc, Seq(new DeltaConversionTarget(s, deltaDir)))
    require(r1.forall(_.status == "SUCCESS"), r1.mkString(";"))
    addFile("f2.parquet", 2000000L)
    hudiCommit()                                   // instant B: commit(f2)
    Files.delete(Paths.get(dataDir, "f1.parquet"))
    addFile("f3.parquet", 3000000L)
    hudiCommit()                      // instant C: replacecommit(-f1, +f3)
    require(graft.formats.hudi.HudiTimeline.readCommit(hudiDir,
      graft.formats.hudi.HudiTimeline.listInstants(hudiDir).last)
      .action == "replacecommit")
    val r2 = controller.sync(hsrc, Seq(new DeltaConversionTarget(s, deltaDir)))
    require(r2.forall(o => o.status == "SUCCESS" && o.mode == "INCREMENTAL"),
      r2.mkString(";"))
    new DeltaConversionSource(s, deltaDir, "nation").toDataFrame
      .agg(count(lit(1)).as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"),
        countDistinct(col("n_nationkey")).as("distinct_keys"))
  }

  val syncIncrementalHudiSql: String =
    """SELECT 2*count(*) AS cnt,
      |  CAST(2*sum(n_nationkey) AS BIGINT) AS sum_key,
      |  count(DISTINCT n_nationkey) AS distinct_keys
      |FROM nation""".stripMargin

  /** The REAL `.hoodie/metadata` table (HBase HFile v3 wire format, the
    * index a Hudi reader with `hoodie.metadata.enable=true` consumes;
    * reference gets it via the Hudi write client,
    * HudiConversionTarget.java:600+) drives the read end-to-end: two
    * sync commits maintain the files partition, then the query lists
    * the table FROM the metadata HFile/log merge — not the filesystem —
    * and aggregates the listed files. A missing or phantom file in the
    * index breaks every aggregate.
    */
  def hudiMetadataListing(s: SparkSession, dir: String): DataFrame = {
    import graft.formats.hudi.HudiMetadataTable
    // overlay layout (the reference's: all formats share one base path)
    // so the metadata table can index base/partition/name
    val table = graft.util.TempDirs.create("graft_mdt_hudi")
    val srcFile = Paths.get(s"$dir/orders.parquet")
    def addFile(name: String, mtime: Long): Unit = {
      Files.copy(srcFile, Paths.get(table, name),
        StandardCopyOption.REPLACE_EXISTING)
      Paths.get(table, name).toFile.setLastModified(mtime)
    }
    def psrc = new ParquetDirectorySource(s, table, "orders")
    val tgt = new graft.formats.hudi.HudiConversionTarget(s, table)
    val controller = new ConversionController
    addFile("f1.parquet", 1000000L)
    addFile("f2.parquet", 1000000L)
    require(controller.sync(psrc, Seq(tgt)).forall(_.status == "SUCCESS"))
    addFile("f3.parquet", 2000000L)
    require(controller.sync(psrc, Seq(tgt)).forall(_.status == "SUCCESS"))

    require(HudiMetadataTable.exists(table),
      s"no .hoodie/metadata authored at $table")
    val (_, filesByPart) = HudiMetadataTable.readFiles(table)
    val paths = filesByPart.toSeq.flatMap { case (p, m) =>
      m.keys.map(n => if (p == HudiMetadataTable.NonPartitionedName)
        s"$table/$n" else s"$table/$p/$n")
    }
    require(paths.size == 3 && paths.forall(_.endsWith(".parquet")),
      s"metadata files partition should list exactly f1..f3: $paths")
    s.read.parquet(paths: _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_orderkey")).cast("long").as("sum_key"),
        countDistinct(col("o_orderkey")).as("distinct_keys"))
  }

  val hudiMetadataListingSql: String =
    """SELECT 3*count(*) AS cnt,
      |  CAST(3*sum(o_orderkey) AS BIGINT) AS sum_key,
      |  count(DISTINCT o_orderkey) AS distinct_keys
      |FROM orders""".stripMargin

  /** Incremental sync with ICEBERG as the SOURCE: snapshot-diff replay
    * (sequence-number backlog, per-snapshot manifest diff) across an
    * append and a replace, into an already-synced Delta target.
    */
  def syncIncrementalIceberg(s: SparkSession, dir: String): DataFrame = {
    val dataDir = graft.util.TempDirs.create("graft_inci_data")
    val iceDir = graft.util.TempDirs.create("graft_inci_ice")
    val deltaDir = graft.util.TempDirs.create("graft_inci_delta")
    val srcFile = Paths.get(s"$dir/region.parquet")
    def addFile(name: String, mtime: Long): Unit = {
      Files.copy(srcFile, Paths.get(dataDir, name),
        StandardCopyOption.REPLACE_EXISTING)
      Paths.get(dataDir, name).toFile.setLastModified(mtime)
    }
    def psrc = new ParquetDirectorySource(s, dataDir, "region")
    val iceTgt = new graft.formats.iceberg.IcebergConversionTarget(s, iceDir)
    def iceCommit(): Unit = {
      val o = TableFormatSync.syncSnapshot(Seq(iceTgt),
        psrc.currentSnapshot(), psrc.sourceFormat)
      require(o.forall(_.status == "SUCCESS"), o.mkString(";"))
    }
    addFile("f1.parquet", 1000000L)
    iceCommit()                                     // snapshot 1: +f1
    def isrc = new graft.formats.iceberg.IcebergConversionSource(
      s, iceDir, "region")
    val controller = new ConversionController
    val r1 = controller.sync(isrc, Seq(new DeltaConversionTarget(s, deltaDir)))
    require(r1.forall(_.status == "SUCCESS"), r1.mkString(";"))
    addFile("f2.parquet", 2000000L)
    iceCommit()                                     // snapshot 2: +f2
    Files.delete(Paths.get(dataDir, "f1.parquet"))
    addFile("f3.parquet", 3000000L)
    iceCommit()                                     // snapshot 3: -f1 +f3
    val r2 = controller.sync(isrc, Seq(new DeltaConversionTarget(s, deltaDir)))
    require(r2.forall(o => o.status == "SUCCESS" && o.mode == "INCREMENTAL"),
      r2.mkString(";"))
    new DeltaConversionSource(s, deltaDir, "region").toDataFrame
      .agg(count(lit(1)).as("cnt"),
        sum(col("r_regionkey")).cast("long").as("sum_key"),
        countDistinct(col("r_regionkey")).as("distinct_keys"))
  }

  val syncIncrementalIcebergSql: String =
    """SELECT 2*count(*) AS cnt,
      |  CAST(2*sum(r_regionkey) AS BIGINT) AS sum_key,
      |  count(DISTINCT r_regionkey) AS distinct_keys
      |FROM region""".stripMargin

  /** Incremental sync with PAIMON as the SOURCE — completes the
    * incremental source matrix (delta/hudi/iceberg/paimon): snapshot-id
    * backlog, per-snapshot delta-manifest replay (ADD + DELETE kinds)
    * into an already-synced Delta target.
    */
  def syncIncrementalPaimon(s: SparkSession, dir: String): DataFrame = {
    val dataDir = graft.util.TempDirs.create("graft_incp_data")
    val paimonDir = graft.util.TempDirs.create("graft_incp_paimon")
    val deltaDir = graft.util.TempDirs.create("graft_incp_delta")
    val srcFile = Paths.get(s"$dir/region.parquet")
    def addFile(name: String, mtime: Long): Unit = {
      Files.copy(srcFile, Paths.get(dataDir, name),
        StandardCopyOption.REPLACE_EXISTING)
      Paths.get(dataDir, name).toFile.setLastModified(mtime)
    }
    def psrc = new ParquetDirectorySource(s, dataDir, "region")
    val paimonTgt = new graft.formats.paimon.PaimonConversionTarget(s, paimonDir)
    def paimonCommit(): Unit = {
      val o = TableFormatSync.syncSnapshot(Seq(paimonTgt),
        psrc.currentSnapshot(), psrc.sourceFormat)
      require(o.forall(_.status == "SUCCESS"), o.mkString(";"))
    }
    addFile("f1.parquet", 1000000L)
    paimonCommit()                                  // snapshot 1: +f1
    def msrc = new graft.formats.paimon.PaimonConversionSource(
      s, paimonDir, "region")
    val controller = new ConversionController
    val r1 = controller.sync(msrc, Seq(new DeltaConversionTarget(s, deltaDir)))
    require(r1.forall(_.status == "SUCCESS"), r1.mkString(";"))
    addFile("f2.parquet", 2000000L)
    paimonCommit()                                  // snapshot 2: +f2
    Files.delete(Paths.get(dataDir, "f1.parquet"))
    addFile("f3.parquet", 3000000L)
    paimonCommit()                                  // snapshot 3: -f1 +f3
    val r2 = controller.sync(msrc, Seq(new DeltaConversionTarget(s, deltaDir)))
    require(r2.forall(o => o.status == "SUCCESS" && o.mode == "INCREMENTAL"),
      r2.mkString(";"))
    new DeltaConversionSource(s, deltaDir, "region").toDataFrame
      .agg(count(lit(1)).as("cnt"),
        sum(col("r_regionkey")).cast("long").as("sum_key"),
        countDistinct(col("r_regionkey")).as("distinct_keys"))
  }

  val syncIncrementalPaimonSql: String =
    """SELECT 2*count(*) AS cnt,
      |  CAST(2*sum(r_regionkey) AS BIGINT) AS sum_key,
      |  count(DISTINCT r_regionkey) AS distinct_keys
      |FROM region""".stripMargin

  /** Parquet dir → Iceberg (full snapshot), read back via manifests. */
  def syncParquetToIceberg(s: SparkSession, dir: String): DataFrame = {
    val target = graft.util.TempDirs.create("graft_ice_ord")
    val src = new ParquetDirectorySource(s, s"$dir/orders.parquet", "orders")
    val tgt = new graft.formats.iceberg.IcebergConversionTarget(s, target)
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(tgt), src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    new graft.formats.iceberg.IcebergConversionSource(s, target, "orders")
      .toDataFrame
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        Gate.sumMeasure(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  val syncParquetToIcebergSql: String =
    """SELECT o_orderstatus, count(*) AS cnt,
      |  CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** The full conversion chain parquet → Delta → Iceberg → read-back:
    * metadata fidelity must survive two format hops (zero data copy at
    * every step — all three tables share the same physical parquet).
    */
  def syncChainDeltaIceberg(s: SparkSession, dir: String): DataFrame = {
    val deltaDir = graft.util.TempDirs.create("graft_chain_delta")
    val iceDir = graft.util.TempDirs.create("graft_chain_ice")
    val src = new ParquetDirectorySource(s, s"$dir/customer.parquet", "customer")
    val r1 = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(s, deltaDir)),
      src.currentSnapshot(), src.sourceFormat)
    require(r1.forall(_.status == "SUCCESS"), r1.mkString(";"))
    val deltaSrc = new DeltaConversionSource(s, deltaDir, "customer")
    val r2 = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, iceDir)),
      deltaSrc.currentSnapshot(), deltaSrc.sourceFormat)
    require(r2.forall(_.status == "SUCCESS"), r2.mkString(";"))
    new graft.formats.iceberg.IcebergConversionSource(s, iceDir, "customer")
      .toDataFrame
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        Gate.sumMeasure(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  val syncChainDeltaIcebergSql: String =
    """SELECT c_mktsegment, count(*) AS cnt,
      |  CAST(CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Parquet dir → Hudi COW timeline, read back with footer-stat
    * enrichment.
    */
  def syncParquetToHudi(s: SparkSession, dir: String): DataFrame = {
    val target = graft.util.TempDirs.create("graft_hudi_part")
    val src = new ParquetDirectorySource(s, s"$dir/part.parquet", "part")
    val tgt = new graft.formats.hudi.HudiConversionTarget(s, target)
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(tgt), src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    new graft.formats.hudi.HudiConversionSource(s, target, "part")
      .toDataFrame
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"),
        Gate.sumMeasure(col("p_retailprice")).as("sum_price"))
      .orderBy("p_brand")
  }

  val syncParquetToHudiSql: String =
    """SELECT p_brand, count(*) AS cnt,
      |  CAST(CAST(sum(CAST(CAST(p_retailprice AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_price
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Hudi MERGE_ON_READ → Delta through the read-optimized view: a base
    * commit from nation.parquet plus a log-only deltacommit (an unreadable
    * non-parquet log file on disk). The RO contract — the reference's own
    * MOR equivalence mode (ITConversionController.java:434-446,
    * `hoodie.datasource.query.type=read_optimized`) — means the converted
    * Delta table reads exactly the base rows and never touches the log.
    */
  def syncHudiMorToDelta(s: SparkSession, dir: String): DataFrame = {
    import graft.formats.hudi._
    val hudiDir = graft.util.TempDirs.create("graft_hudi_mor")
    val deltaDir = graft.util.TempDirs.create("graft_hudi_mor_delta")
    Files.copy(Paths.get(s"$dir/nation.parquet"),
      Paths.get(hudiDir, "base1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val base = s"$hudiDir/base1.parquet"
    val nRows = s.read.parquet(base).count()
    val schemaJson = s.read.parquet(base).schema.json
    val fid = HudiTimeline.fileId(base)
    HudiTimeline.writeProperties(hudiDir, "nation", "MERGE_ON_READ")
    require(HudiTimeline.writeCommit(HudiTimeline.CommitMeta("100", "commit",
      Map("" -> Seq(HudiTimeline.WriteStat(fid, "base1.parquet", nRows,
        Files.size(Paths.get(base))))),
      Map.empty, Map("schema" -> schemaJson)), hudiDir))
    val logName = s".${fid}_100.log.1_0-1-1"
    Files.write(Paths.get(hudiDir, logName), "avro-log-block".getBytes("UTF-8"))
    require(HudiTimeline.writeCommit(HudiTimeline.CommitMeta("200",
      "deltacommit",
      Map("" -> Seq(HudiTimeline.WriteStat(fid, logName, 2, 14))),
      Map.empty, Map("schema" -> schemaJson)), hudiDir))

    val src = new HudiConversionSource(s, hudiDir, "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(s, deltaDir)), src.currentSnapshot(),
      src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    new DeltaConversionSource(s, deltaDir, "nation").toDataFrame
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("n_nationkey")).as("distinct_nations"))
      .orderBy("n_regionkey")
  }

  val syncHudiMorToDeltaSql: String =
    """SELECT n_regionkey, count(*) AS cnt,
      |  count(DISTINCT n_nationkey) AS distinct_nations
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** Parquet dir → Paimon snapshot tree (a target the reference lacks —
    * it reads Paimon but cannot write it).
    */
  def syncParquetToPaimon(s: SparkSession, dir: String): DataFrame = {
    val target = graft.util.TempDirs.create("graft_paimon_cust")
    val src = new ParquetDirectorySource(s, s"$dir/customer.parquet", "customer")
    val tgt = new graft.formats.paimon.PaimonConversionTarget(s, target)
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(tgt), src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    new graft.formats.paimon.PaimonConversionSource(s, target, "customer")
      .toDataFrame
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        Gate.sumMeasure(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  val syncParquetToPaimonSql: String =
    """SELECT c_mktsegment, count(*) AS cnt,
      |  CAST(CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Hive-partitioned sync: write events partitioned by event_type, sync
    * the directory into Delta, read back with a partition filter —
    * partition values must survive the metadata plane and prune correctly.
    */
  def syncPartitionedEvents(s: SparkSession, dir: String): DataFrame = {
    val dataDir = graft.util.TempDirs.create("graft_part_data")
    val target = graft.util.TempDirs.create("graft_part_delta")
    Tables.events(s, dir)
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
      .repartition(col("event_type"))     // one file per partition, not one per task
      .write.mode("overwrite").partitionBy("event_type").parquet(dataDir)
    val src = new ParquetDirectorySource(s, dataDir, "events")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(s, target)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    new DeltaConversionSource(s, target, "events").toDataFrame
      .filter(col("event_type") === "click")
      .agg(count(lit(1)).as("n_clicks"),
        Gate.sumMeasure(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
  }

  val syncPartitionedEventsSql: String =
    """SELECT count(*) AS n_clicks,
      |  CAST(CAST(sum(CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_value,
      |  count(DISTINCT user_id) AS n_users
      |FROM events WHERE event_type = 'click'""".stripMargin

  /** Time-transform partitioning end-to-end: events laid out by
    * `ts_day=yyyy-MM-dd` dirs, source configured via the partition-spec DSL
    * (`ts:DAY:yyyy-MM-dd`), synced to Delta, read back with a partition
    * filter — the transform survives the metadata plane and prunes.
    */
  def syncTimePartitioned(s: SparkSession, dir: String): DataFrame = {
    val dataDir = graft.util.TempDirs.create("graft_day_data")
    val target = graft.util.TempDirs.create("graft_day_delta")
    Tables.events(s, dir)
      .withColumn("ts_day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
      .repartition(col("ts_day"))     // one file per partition, not one per task
      .write.mode("overwrite").partitionBy("ts_day").parquet(dataDir)
    val spec = graft.model.PartitionSpecDSL.parse("ts:DAY:yyyy-MM-dd")
    val src = new ParquetDirectorySource(s, dataDir, "events_by_day", spec)
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(s, target)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    val back = new DeltaConversionSource(s, target, "events_by_day")
    // partition spec with the DAY transform must round-trip
    require(back.currentTable().partitionFields.exists(p =>
      p.sourceField == "ts" && p.transform == graft.model.Transform.Day),
      back.currentTable().partitionFields.toString)
    back.toDataFrame
      .filter(col("ts_day") === "2024-01-05")
      .agg(count(lit(1)).as("n_events"),
        Gate.sumMeasure(col("value")).as("sum_value"))
  }

  val syncTimePartitionedSql: String =
    """SELECT count(*) AS n_events,
      |  CAST(CAST(sum(CAST(CAST(value AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_value
      |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-05'""".stripMargin

  /** The unified reader in the gate: convert lineitem to Delta, read it
    * back with `spark.read.format("graft")` (format auto-detected, scan
    * through SnapshotFileIndex), aggregate.
    */
  def graftReaderDelta(s: SparkSession, dir: String): DataFrame = {
    val target = graft.util.TempDirs.create("graft_reader_delta")
    val src = new ParquetDirectorySource(s, s"$dir/lineitem.parquet", "lineitem")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(s, target)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    s.read.format("graft").load(target)
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        Gate.sumMeasure(col("l_quantity")).as("sum_qty"))
      .orderBy("l_linestatus")
  }

  val graftReaderDeltaSql: String =
    """SELECT l_linestatus, count(*) AS cnt,
      |  CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_qty
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Unified reader over a converted HUDI table: same end-to-end shape as
    * `graft_reader_delta` but the target metadata plane is a Hudi
    * timeline — `format("graft")` auto-detects `.hoodie/`, replays the
    * timeline, and scans through SnapshotFileIndex.
    */
  def graftReaderHudi(s: SparkSession, dir: String): DataFrame = {
    val target = graft.util.TempDirs.create("graft_reader_hudi")
    val src = new ParquetDirectorySource(s, s"$dir/orders.parquet", "orders")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.hudi.HudiConversionTarget(s, target)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    s.read.format("graft").load(target)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        Gate.sumMeasure(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  val graftReaderHudiSql: String =
    """SELECT o_orderstatus, count(*) AS cnt,
      |  CAST(CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Unified reader over a converted ICEBERG table (metadata JSON +
    * manifests), same contract.
    */
  def graftReaderIceberg(s: SparkSession, dir: String): DataFrame = {
    val target = graft.util.TempDirs.create("graft_reader_iceberg")
    val src = new ParquetDirectorySource(s, s"$dir/customer.parquet",
      "customer")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, target)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    s.read.format("graft").load(target)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        Gate.sumMeasure(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  val graftReaderIcebergSql: String =
    """SELECT c_mktsegment, count(*) AS cnt,
      |  CAST(CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Unified reader over a graft-written PAIMON layout — completes the
    * `format("graft")` matrix (delta/hudi/iceberg/paimon), format
    * auto-detected from `snapshot/LATEST`.
    */
  def graftReaderPaimon(s: SparkSession, dir: String): DataFrame = {
    val target = graft.util.TempDirs.create("graft_reader_paimon")
    val src = new ParquetDirectorySource(s, s"$dir/supplier.parquet",
      "supplier")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.paimon.PaimonConversionTarget(s, target)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    s.read.format("graft").load(target)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("cnt"),
        Gate.sumMeasure(col("s_acctbal")).as("sum_bal"))
      .orderBy("s_nationkey")
  }

  val graftReaderPaimonSql: String =
    s"""SELECT s_nationkey, count(*) AS cnt,
       |  ${Gate.sumMeasureSql("s_acctbal")} AS sum_bal
       |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** The two halves of the library composing: CURATE the corpus
    * (quality filter + exact dedup, the same stages as
    * `pipeline_curation_e2e`), WRITE the curated table as parquet, SYNC
    * it to Delta, and read it back through `format("graft")` — the full
    * training-data-production loop (curate → land → publish metadata →
    * serve to any engine) in one oracle-checked query.
    */
  def pipelineWriteRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val quality = graft.operators.TextAnalysis
      .gopherQualityFlags(docs, "doc_id", "text", minTokens = 10)
      .filter(col("gopher_pass")).select("doc_id")
    val keepers = graft.operators.Dedup
      .exact(docs.join(quality, "doc_id"), "doc_id", "text")
      .select(col("keeper").as("doc_id"))
    val curated = docs.join(keepers, "doc_id")
      .select("doc_id", "lang", "source", "n_chars")
    val staged = graft.util.TempDirs.create("graft_curated")
    curated.write.mode("overwrite").parquet(s"$staged/curated")
    val target = graft.util.TempDirs.create("graft_curated_delta")
    val src = new ParquetDirectorySource(s, s"$staged/curated", "curated")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(s, target)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    s.read.format("graft").load(target)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy("lang")
  }

  val pipelineWriteRoundtripSql: String = {
    val swHits = graft.operators.TextAnalysis.stopwords("en").map(sw =>
      s"CASE WHEN position(' $sw ' IN ' ' || text || ' ') > 0 THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH q AS (
       |  SELECT doc_id, text, lang, n_chars FROM documents
       |  WHERE (len(text) - len(replace(text, ' ', '')) + 1)
       |          BETWEEN 10 AND 100000
       |    AND CAST(len(replace(text, ' ', '')) AS DOUBLE) /
       |        (len(text) - len(replace(text, ' ', '')) + 1)
       |          BETWEEN 3.0 AND 10.0
       |    AND ($swHits) >= 2),
       |k AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text))
       |SELECT d.lang, count(*) AS n_docs,
       |  CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
       |FROM documents d JOIN k USING (doc_id)
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  }

  /** Catalog round trip in the gate: convert supplier to Delta, register
    * the DELTA DIR in the session catalog (`USING graft` — the entry holds
    * only the log; reads resolve through the metadata plane), query by
    * NAME via Spark SQL.
    */
  def catalogSqlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val target = graft.util.TempDirs.create("graft_cat_sql")
    val src = new ParquetDirectorySource(s, s"$dir/supplier.parquet", "supplier")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(s, target)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    val client = new graft.catalog.SparkSessionCatalogClient(s)
    val id = graft.catalog.CatalogTableIdentifier("graft_gate", "supplier")
    val table = src.currentTable().copy(basePath = target)
    val reg = graft.catalog.CatalogOrchestrator.syncTable(
      Seq(client), id, table, graft.model.TableFormats.Delta)
    require(reg.forall(_.status == "SUCCESS"), reg.mkString(";"))
    s.sql(
      """SELECT count(*) AS cnt,
        |  CAST(CAST(sum(CAST(CAST(s_acctbal AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_bal,
        |  min(s_name) AS min_name
        |FROM graft_gate.supplier""".stripMargin)
  }

  val catalogSqlRoundtripSql: String =
    """SELECT count(*) AS cnt,
      |  CAST(CAST(sum(CAST(CAST(s_acctbal AS DECIMAL(25,6)) * 1000000 AS BIGINT)) AS BIGINT) AS DOUBLE)/1000000.0 AS sum_bal,
      |  min(s_name) AS min_name
      |FROM supplier""".stripMargin

  /** Iceberg REST catalog round trip over REAL loopback HTTP: convert
    * supplier to Iceberg, register its metadata-location in the
    * in-process spec-shaped REST server through the wire client, LOAD it
    * back through the same wire (the catalog answer carries the
    * metadata-location), then advance the pointer with a second commit +
    * refresh and read THROUGH the refreshed answer — the served rows are
    * supplier twice. A stale pointer (refresh not landing) or a
    * mis-parsed LoadTableResponse cannot hash-match.
    */
  def catalogRestRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.catalog._
    import graft.formats.iceberg.{IcebergConversionSource, IcebergMetadata}
    val target = graft.util.TempDirs.create("graft_cat_rest")
    val src = new ParquetDirectorySource(s, s"$dir/supplier.parquet",
      "supplier")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, target)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    val server = new IcebergRestCatalogServer().start()
    try {
      val client = new IcebergRestCatalogClient(server.baseUri)
      val id = CatalogTableIdentifier("graft_gate", "supplier_rest")
      val desc = new IcebergConversionSource(s, target, "supplier")
        .currentTable()
      def metaLoc = IcebergMetadata.metadataFile(target,
        IcebergMetadata.currentVersion(target).get)
      val reg = CatalogOrchestrator.syncTable(Seq(client), id, desc,
        graft.model.TableFormats.Iceberg, Some(metaLoc))
      require(reg.forall(_.status == "SUCCESS"), reg.mkString(";"))
      // second commit doubles the rows; the catalog must serve the
      // REFRESHED pointer
      val extra = s"$target/data/extra-${java.util.UUID.randomUUID()}"
      s.read.parquet(s"$dir/supplier.parquet").write.parquet(extra)
      graft.formats.iceberg.IcebergDeletes.appendDataFiles(s, target, extra)
      val reg2 = CatalogOrchestrator.syncTable(Seq(client), id, desc,
        graft.model.TableFormats.Iceberg, Some(metaLoc))
      require(reg2.forall(_.status == "SUCCESS"), reg2.mkString(";"))
      val answered = client.getTable(id).getOrElse(
        throw new IllegalStateException("registered table not served back"))
      val answeredLoc = answered.properties("metadata_location")
      require(answeredLoc == metaLoc, s"stale pointer: $answeredLoc")
      // read BY NAME through the unified reader: the graft datasource
      // resolves ns.table over the REST wire to the table location and
      // scans it — no path option anywhere
      require(server.requestCount >= 8,
        s"expected a real wire exchange, saw ${server.requestCount}")
      val byName = s.read.format("graft")
        .option("restCatalog", server.baseUri)
        .option("table", "graft_gate.supplier_rest")
        .load()
      // load() resolved the location over the wire EAGERLY; the scan
      // itself reads the filesystem, so it survives the server stopping
      byName
        .agg(count(lit(1)).as("cnt"),
          sum(col("s_suppkey")).cast("long").as("sum_key"),
          min(col("s_name")).as("min_name"))
    } finally server.stop()
  }

  val catalogRestRoundtripSql: String =
    """SELECT 2*count(*) AS cnt,
      |  CAST(2*sum(s_suppkey) AS BIGINT) AS sum_key,
      |  min(s_name) AS min_name
      |FROM supplier""".stripMargin

  /** Time travel: two commits into Delta (1 file, then 2), then read the
    * table as of version 0 — must see exactly the first file's rows.
    */
  def timeTravelDelta(s: SparkSession, dir: String): DataFrame = {
    val dataDir = graft.util.TempDirs.create("graft_tt_data")
    val target = graft.util.TempDirs.create("graft_tt_delta")
    val srcFile = Paths.get(s"$dir/region.parquet")
    Files.copy(srcFile, Paths.get(dataDir, "f1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Paths.get(dataDir, "f1.parquet").toFile.setLastModified(1000000L)
    val controller = new ConversionController
    def src = new ParquetDirectorySource(s, dataDir, "region")
    controller.sync(src, Seq(new DeltaConversionTarget(s, target)))
    Files.copy(srcFile, Paths.get(dataDir, "f2.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Paths.get(dataDir, "f2.parquet").toFile.setLastModified(2000000L)
    controller.sync(src, Seq(new DeltaConversionTarget(s, target)))
    val deltaSrc = new DeltaConversionSource(s, target, "region")
    val v0 = graft.formats.delta.DeltaRead
      .toDataFrame(s, deltaSrc.snapshotAt(0L))
      .agg(count(lit(1)).as("v0_rows"))
    val latest = deltaSrc.toDataFrame.agg(count(lit(1)).as("latest_rows"))
    v0.crossJoin(latest)
  }

  val timeTravelDeltaSql: String =
    """SELECT count(*) AS v0_rows, 2*count(*) AS latest_rows FROM region""".stripMargin

  /** SQL time-travel parity: the option-based snapshot reads
    * (`time_travel_*` gates) as `SELECT ... VERSION AS OF` /
    * `TIMESTAMP AS OF` over `USING graft` catalog tables
    * ([[graft.sql.GraftTimeTravelRule]]) — Delta (two commits, pinned
    * commit mtimes for a deterministic timestamp cut) and Iceberg (two
    * appends, sequence-number versions).
    */
  def sqlTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val gs = graft.sql.GraftSql.session(s)
    val region = s.read.parquet(s"$dir/region.parquet")
    val dTab = graft.util.TempDirs.create("graft_sqltt_delta")
    graft.formats.delta.DeltaWrite.write(s, dTab, region,
      overwrite = false)
    graft.formats.delta.DeltaWrite.write(s, dTab,
      region.withColumn("r_regionkey", col("r_regionkey") + 100),
      overwrite = false)
    // delta resolves TIMESTAMP AS OF by commit-file mtime — pin both
    Seq(0L -> 1000000L, 1L -> 2000000L).foreach { case (v, ts) =>
      new java.io.File(graft.formats.delta.DeltaLog.versionFile(dTab, v))
        .setLastModified(ts)
    }
    val iTab = graft.util.TempDirs.create("graft_sqltt_ice")
    region.write.format("graft").option("tableFormat", "iceberg")
      .mode("append").save(iTab)
    region.withColumn("r_regionkey", col("r_regionkey") + 100)
      .write.format("graft").option("tableFormat", "iceberg")
      .mode("append").save(iTab)
    gs.sql("CREATE DATABASE IF NOT EXISTS graft_gate")
    gs.sql("DROP TABLE IF EXISTS graft_gate.sqltt_delta")
    gs.sql(s"CREATE TABLE graft_gate.sqltt_delta USING graft " +
      s"LOCATION '$dTab'")
    gs.sql("DROP TABLE IF EXISTS graft_gate.sqltt_ice")
    gs.sql(s"CREATE TABLE graft_gate.sqltt_ice USING graft " +
      s"LOCATION '$iTab'")
    gs.sql(
      """SELECT v0.cnt AS v0_cnt, v0.sum_key AS v0_sum,
        |  ts.cnt AS ts_cnt, hd.cnt AS head_cnt, hd.sum_key AS head_sum,
        |  iv.cnt AS ice_v1_cnt, iv.sum_key AS ice_v1_sum
        |FROM
        |  (SELECT count(*) AS cnt, CAST(sum(r_regionkey) AS BIGINT)
        |     AS sum_key
        |   FROM graft_gate.sqltt_delta VERSION AS OF 0) v0,
        |  (SELECT count(*) AS cnt
        |   FROM graft_gate.sqltt_delta TIMESTAMP AS OF '1500000') ts,
        |  (SELECT count(*) AS cnt, CAST(sum(r_regionkey) AS BIGINT)
        |     AS sum_key
        |   FROM graft_gate.sqltt_delta) hd,
        |  (SELECT count(*) AS cnt, CAST(sum(r_regionkey) AS BIGINT)
        |     AS sum_key
        |   FROM graft_gate.sqltt_ice VERSION AS OF 1) iv""".stripMargin)
  }

  val sqlTimeTravelSql: String =
    """SELECT count(*) AS v0_cnt, CAST(sum(r_regionkey) AS BIGINT) AS v0_sum,
      |  count(*) AS ts_cnt,
      |  2*count(*) AS head_cnt,
      |  CAST(2*sum(r_regionkey) + 100*count(*) AS BIGINT) AS head_sum,
      |  count(*) AS ice_v1_cnt,
      |  CAST(sum(r_regionkey) AS BIGINT) AS ice_v1_sum
      |FROM region""".stripMargin

  /** timestampAsOf time travel, deterministic: the commit-file mtimes are
    * pinned (Delta resolves by commit mtime — delta-spark's rule) and the
    * Iceberg snapshot timestamps read back from metadata, so a timestamp
    * between the two commits must resolve to the first on BOTH formats.
    */
  def timeTravelTimestamp(s: SparkSession, dir: String): DataFrame = {
    // ---- Delta side: two commits, mtimes pinned at 1e9 / 2e9 ms
    val dataDir = graft.util.TempDirs.create("graft_tts_data")
    val target = graft.util.TempDirs.create("graft_tts_delta")
    val srcFile = Paths.get(s"$dir/region.parquet")
    Files.copy(srcFile, Paths.get(dataDir, "f1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Paths.get(dataDir, "f1.parquet").toFile.setLastModified(1000000L)
    val controller = new ConversionController
    def src = new ParquetDirectorySource(s, dataDir, "region")
    controller.sync(src, Seq(new DeltaConversionTarget(s, target)))
    Files.copy(srcFile, Paths.get(dataDir, "f2.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Paths.get(dataDir, "f2.parquet").toFile.setLastModified(2000000L)
    controller.sync(src, Seq(new DeltaConversionTarget(s, target)))
    new java.io.File(graft.formats.delta.DeltaLog.versionFile(target, 0L))
      .setLastModified(1000000000L)
    new java.io.File(graft.formats.delta.DeltaLog.versionFile(target, 1L))
      .setLastModified(2000000000L)
    val deltaV0 = s.read.format("graft")
      .option("timestampAsOf", "1500000000").load(target)
      .agg(count(lit(1)).as("delta_rows"))

    // ---- Iceberg side: two append snapshots; pick the midpoint of their
    // recorded timestamps (distinct by construction: the second commit's
    // lastUpdatedMs is strictly later)
    val ice = graft.util.TempDirs.create("graft_tts_ice")
    val src1 = new ParquetDirectorySource(s, dataDir, "region")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, ice)),
      src1.currentSnapshot(), src1.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    val extraDir = s"$ice/data/extra-${java.util.UUID.randomUUID()}"
    s.read.parquet(s"$dir/region.parquet").write.parquet(extraDir)
    Thread.sleep(5)   // snapshot timestamps must differ
    graft.formats.iceberg.IcebergDeletes.appendDataFiles(s, ice, extraDir)
    val m = graft.formats.iceberg.IcebergMetadata.read(ice,
      graft.formats.iceberg.IcebergMetadata.currentVersion(ice).get)
    val times = m.snapshots.map(_.timestampMs).sorted
    require(times.size == 2 && times(0) < times(1), times.toString)
    val mid = (times(0) + times(1)) / 2
    val iceV1 = s.read.format("graft")
      .option("timestampAsOf", mid.toString).load(ice)
      .agg(count(lit(1)).as("ice_rows"))
    deltaV0.crossJoin(iceV1)
  }

  // delta resolves to version 0 (f1 only); iceberg's first snapshot
  // already holds f1+f2 (synced after both landed)
  val timeTravelTimestampSql: String =
    """SELECT count(*) AS delta_rows, 2*count(*) AS ice_rows FROM region""".stripMargin

  /** Iceberg v2 row-level deletes end-to-end: nation synced to Iceberg as
    * ONE sorted data file, a position-delete commit dropping every 4th
    * position, then the delete-aware read. The sorted single file makes
    * position == rank(n_nationkey), which the oracle recomputes with
    * row_number — the deleted POSITIONS, not values, are the contract.
    */
  def icebergPosDeleteRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parquetDir = graft.util.TempDirs.create("graft_icedel_src")
    s.read.parquet(s"$dir/nation.parquet")
      .repartition(1).sortWithinPartitions("n_nationkey")
      .write.mode("overwrite").parquet(parquetDir)
    val table = graft.util.TempDirs.create("graft_icedel_tbl")
    val src = new ParquetDirectorySource(s, parquetDir, "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    val f = new graft.formats.iceberg.IcebergConversionSource(s, table,
      "nation").currentSnapshot().files.collect()(0)
    graft.formats.iceberg.IcebergDeletes.appendPositionDeletes(s, table,
      (0L until f.recordCount by 4).map(p => (f.path, p))
        .toDF("file_path", "pos"))
    new graft.formats.iceberg.IcebergConversionSource(s, table, "nation")
      .toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"))
  }

  val icebergPosDeleteReadSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key
      |FROM (SELECT n_nationkey,
      |        row_number() OVER (ORDER BY n_nationkey) - 1 AS pos
      |      FROM nation)
      |WHERE pos % 4 <> 0""".stripMargin

  /** Iceberg FORMAT-VERSION 3 deletion vectors end-to-end: nation synced
    * as ONE sorted data file (position == rank, same contract as
    * `iceberg_pos_delete_read`), then TWO deletion-vector commits — the
    * first masks positions ≡ 1 (mod 3) and upgrades the table to v3, the
    * second masks positions ≡ 2 (mod 5) against the SAME data file, which
    * must MERGE into one DV (spec rule: at most one live DV per data
    * file) — and the delete-aware read serves exactly the surviving
    * rows. The puffin blob layout is the spec's Delta-compatible frame;
    * the positions travel through an executor-side roaring decode, so a
    * framing/CRC/key bug cannot hash-match.
    */
  def icebergV3DvRead(s: SparkSession, dir: String): DataFrame = {
    val parquetDir = graft.util.TempDirs.create("graft_icedv_src")
    s.read.parquet(s"$dir/nation.parquet")
      .repartition(1).sortWithinPartitions("n_nationkey")
      .write.mode("overwrite").parquet(parquetDir)
    val table = graft.util.TempDirs.create("graft_icedv_tbl")
    val src = new ParquetDirectorySource(s, parquetDir, "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    val f = new graft.formats.iceberg.IcebergConversionSource(s, table,
      "nation").currentSnapshot().files.collect()(0)
    graft.formats.iceberg.IcebergDeletes.appendDeletionVectors(s, table,
      Map(f.path -> (0L until f.recordCount).filter(_ % 3 == 1)))
    graft.formats.iceberg.IcebergDeletes.appendDeletionVectors(s, table,
      Map(f.path -> (0L until f.recordCount).filter(_ % 5 == 2)))
    // predicate DELETE on the (now-v3) table routes into a DV too —
    // distributed executor-side puffin write, merged with the live DV
    graft.formats.iceberg.IcebergDeletes.deleteWhere(s, table,
      col("n_nationkey") % 11 === 3)
    val m = graft.formats.iceberg.IcebergMetadata.read(table,
      graft.formats.iceberg.IcebergMetadata.currentVersion(table).get)
    require(m.formatVersion == 3, s"expected v3 after DV commit, got ${m.formatVersion}")
    // merge rule observed: exactly ONE live DV entry for the file after
    // all three delete commits
    val live = graft.formats.iceberg.IcebergDeletes
      .liveDeleteRefs(m, m.headSequence)
    require(live.size == 1 && live.head.isDeletionVector,
      s"expected one merged DV, got $live")
    new graft.formats.iceberg.IcebergConversionSource(s, table, "nation")
      .toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"))
  }

  val icebergV3DvReadSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key
      |FROM (SELECT n_nationkey,
      |        row_number() OVER (ORDER BY n_nationkey) - 1 AS pos
      |      FROM nation)
      |WHERE pos % 3 <> 1 AND pos % 5 <> 2 AND n_nationkey % 11 <> 3""".stripMargin

  /** Deletion vectors on a PARTITIONED v3 table: nation laid out
    * hive-style by `n_regionkey` (one file per region, rows sorted by
    * key so position == rank within the region), synced to Iceberg,
    * then (1) an explicit DV commit masking positions ≡ 1 (mod 3) in
    * EVERY region file — the commit that upgrades the table to v3 and
    * must stamp each DV manifest entry with its referenced file's
    * partition tuple — and (2) a predicate DELETE of the even keys,
    * which lands DVs across all partitions and MERGES with the live
    * per-file DVs. The read-back masks both delete sets exactly.
    */
  def icebergV3DvPartitioned(s: SparkSession, dir: String): DataFrame = {
    val stage = graft.util.TempDirs.create("graft_icedvp_src")
    s.read.parquet(s"$dir/nation.parquet")
      .repartition(col("n_regionkey"))
      .sortWithinPartitions("n_regionkey", "n_nationkey")
      .write.mode("overwrite").partitionBy("n_regionkey").parquet(stage)
    val table = graft.util.TempDirs.create("graft_icedvp_tbl")
    val src = new ParquetDirectorySource(s, stage, "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    val files = new graft.formats.iceberg.IcebergConversionSource(s, table,
      "nation").currentSnapshot().files.collect()
    require(files.length > 1, s"expected one file per region, got ${files.length}")
    graft.formats.iceberg.IcebergDeletes.appendDeletionVectors(s, table,
      files.map(f =>
        f.path -> (0L until f.recordCount).filter(_ % 3 == 1)).toMap)
    graft.formats.iceberg.IcebergDeletes.deleteWhere(s, table,
      col("n_nationkey") % 2 === 0)
    val m = graft.formats.iceberg.IcebergMetadata.read(table,
      graft.formats.iceberg.IcebergMetadata.currentVersion(table).get)
    require(m.formatVersion == 3 && m.partitionSpec.nonEmpty,
      s"expected a partitioned v3 table")
    // one live DV per data file even across partitions (spec merge rule)
    val live = graft.formats.iceberg.IcebergDeletes
      .liveDeleteRefs(m, m.headSequence)
    require(live.forall(_.isDeletionVector) &&
      live.map(_.referencedDataFile.get).distinct.size == live.size,
      s"expected one merged DV per file, got $live")
    new graft.formats.iceberg.IcebergConversionSource(s, table, "nation")
      .toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"))
  }

  val icebergV3DvPartitionedSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key
      |FROM (SELECT n_nationkey,
      |        row_number() OVER (PARTITION BY n_regionkey
      |                           ORDER BY n_nationkey) - 1 AS pos
      |      FROM nation)
      |WHERE pos % 3 <> 1 AND n_nationkey % 2 <> 0""".stripMargin

  /** Iceberg v2 EQUALITY deletes with the spec's sequence-ordering rule,
    * end-to-end: sync nation, equality-delete keys ≡ 0 (mod 3), then
    * APPEND keys ≡ 0 (mod 5) at a higher sequence — the delete must mask
    * only the lower-sequence rows, so re-inserted keys (0, 15, ...)
    * survive. The oracle recomputes exactly that union.
    */
  def icebergEqDeleteRead(s: SparkSession, dir: String): DataFrame = {
    val table = graft.util.TempDirs.create("graft_icedel_eq_tbl")
    val src = new ParquetDirectorySource(s, s"$dir/nation.parquet", "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    val all = s.read.parquet(s"$dir/nation.parquet")
    graft.formats.iceberg.IcebergDeletes.appendEqualityDeletes(s, table,
      all.filter(col("n_nationkey") % 3 === 0).select("n_nationkey"),
      Seq("n_nationkey"))
    val reDir = graft.util.TempDirs.create("graft_icedel_eq_re")
    all.filter(col("n_nationkey") % 5 === 0)
      .write.mode("overwrite").parquet(reDir)
    graft.formats.iceberg.IcebergDeletes.appendDataFiles(s, table, reDir)
    new graft.formats.iceberg.IcebergConversionSource(s, table, "nation")
      .toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"))
  }

  val icebergEqDeleteReadSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key
      |FROM (
      |  SELECT n_nationkey FROM nation WHERE n_nationkey % 3 <> 0
      |  UNION ALL
      |  SELECT n_nationkey FROM nation WHERE n_nationkey % 5 = 0)""".stripMargin

  /** The full MOR-table remedy pipeline: position + equality deletes on
    * an Iceberg table, `rewriteWithDeletes` compaction (purges delete
    * files into a REPLACE snapshot), then the previously-refused
    * file-level path works again — sync to Delta and read through
    * `format("graft")`. Sorted single data file makes position ==
    * rank(n_nationkey) for the oracle.
    */
  def icebergCompactSync(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parquetDir = graft.util.TempDirs.create("graft_icecmp_src")
    s.read.parquet(s"$dir/nation.parquet")
      .repartition(1).sortWithinPartitions("n_nationkey")
      .write.mode("overwrite").parquet(parquetDir)
    val table = graft.util.TempDirs.create("graft_icecmp_tbl")
    val src = new ParquetDirectorySource(s, parquetDir, "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    val f = new graft.formats.iceberg.IcebergConversionSource(s, table,
      "nation").currentSnapshot().files.collect()(0)
    graft.formats.iceberg.IcebergDeletes.appendPositionDeletes(s, table,
      Seq((f.path, 1L)).toDF("file_path", "pos"))
    graft.formats.iceberg.IcebergDeletes.appendEqualityDeletes(s, table,
      s.read.parquet(s"$dir/nation.parquet")
        .filter(col("n_nationkey") % 3 === 0).select("n_nationkey"),
      Seq("n_nationkey"))
    require(graft.formats.iceberg.IcebergDeletes
      .rewriteWithDeletes(s, table), "compaction should have rewritten")
    val compacted = new graft.formats.iceberg.IcebergConversionSource(
      s, table, "nation")
    val deltaDir = graft.util.TempDirs.create("graft_icecmp_delta")
    val out2 = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.delta.DeltaConversionTarget(s, deltaDir)),
      compacted.currentSnapshot(), compacted.sourceFormat)
    require(out2.forall(_.status == "SUCCESS"), out2.mkString(";"))
    s.read.format("graft").load(deltaDir)
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"))
  }

  val icebergCompactSyncSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key
      |FROM (SELECT n_nationkey,
      |        row_number() OVER (ORDER BY n_nationkey) - 1 AS pos
      |      FROM nation)
      |WHERE pos <> 1 AND n_nationkey % 3 <> 0""".stripMargin

  /** Iceberg time travel: region synced at sequence 1, a distinct copy
    * appended at sequence 2; `snapshotAt(1)` must still see exactly the
    * original rows while the latest read sees both.
    */
  def timeTravelIceberg(s: SparkSession, dir: String): DataFrame = {
    val table = graft.util.TempDirs.create("graft_tt_ice")
    val src = new ParquetDirectorySource(s, s"$dir/region.parquet", "region")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    val copyDir = graft.util.TempDirs.create("graft_tt_ice_copy")
    s.read.parquet(s"$dir/region.parquet")
      .write.mode("overwrite").parquet(copyDir)
    graft.formats.iceberg.IcebergDeletes.appendDataFiles(s, table, copyDir)
    val iceSrc = new graft.formats.iceberg.IcebergConversionSource(
      s, table, "region")
    val v1 = graft.formats.delta.DeltaRead
      .toDataFrame(s, iceSrc.snapshotAt(1L))
      .agg(count(lit(1)).as("v1_rows"))
    val latest = iceSrc.toDataFrame.agg(count(lit(1)).as("latest_rows"))
    v1.crossJoin(latest)
  }

  val timeTravelIcebergSql: String =
    """SELECT count(*) AS v1_rows, 2*count(*) AS latest_rows FROM region""".stripMargin

  /** Row-level DELETE on a Delta table via deletion vectors — the
    * write-side twin of the DV-applying read. Two DELETE commits prove
    * the per-file DV union (the second add replaces the first DV
    * wholesale); the delete-aware read serves the surviving rows.
    */
  def deltaDeleteWhere(s: SparkSession, dir: String): DataFrame = {
    val table = graft.util.TempDirs.create("graft_delta_delw")
    val src = new ParquetDirectorySource(s, s"$dir/nation.parquet", "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.delta.DeltaConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    graft.formats.delta.DeltaDeletes.deleteWhere(s, table,
      col("n_nationkey") % 3 === 0)
    graft.formats.delta.DeltaDeletes.deleteWhere(s, table,
      col("n_nationkey") % 5 === 0)
    new graft.formats.delta.DeltaConversionSource(s, table, "nation")
      .toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"))
  }

  val deltaDeleteWhereSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key
      |FROM nation
      |WHERE n_nationkey % 3 <> 0 AND n_nationkey % 5 <> 0""".stripMargin

  /** Schema evolution through incremental sync (the reference's
    * add-column scenario, ITConversionController §schema-add-column):
    * commit 1 syncs region as-is; commit 2 adds files carrying a NEW
    * `extra` column (r_regionkey·10). The target's schema must evolve
    * and the unified reader must serve old files with NULL `extra` —
    * so `cnt` counts both commits but `n_extra`/`sum_extra` only the
    * evolved files.
    */
  def syncSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val dataDir = graft.util.TempDirs.create("graft_evo_data")
    val target = graft.util.TempDirs.create("graft_evo_delta")
    Files.copy(Paths.get(s"$dir/region.parquet"),
      Paths.get(dataDir, "f1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Paths.get(dataDir, "f1.parquet").toFile.setLastModified(1000000L)
    val controller = new ConversionController
    def src = new ParquetDirectorySource(s, dataDir, "region")
    controller.sync(src, Seq(new DeltaConversionTarget(s, target)))

    val stage = graft.util.TempDirs.create("graft_evo_stage")
    s.read.parquet(s"$dir/region.parquet")
      .withColumn("extra", col("r_regionkey") * 10)
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(dataDir, "f2.parquet"))
    Paths.get(dataDir, "f2.parquet").toFile.setLastModified(2000000L)
    controller.sync(src, Seq(new DeltaConversionTarget(s, target)))

    s.read.format("graft").load(target)
      .agg(count(lit(1)).cast("long").as("cnt"),
        count(col("extra")).cast("long").as("n_extra"),
        sum(col("extra")).cast("long").as("sum_extra"))
  }

  val syncSchemaEvolutionSql: String =
    """SELECT CAST(2*count(*) AS BIGINT) AS cnt,
      |  CAST(count(*) AS BIGINT) AS n_extra,
      |  CAST(10*sum(r_regionkey) AS BIGINT) AS sum_extra
      |FROM region""".stripMargin

  /** Row-level UPDATE via deletion vectors: old rows masked, re-written
    * rows landed as new files, ONE commit. The oracle recomputes the
    * CASE expression exactly.
    */
  def deltaUpdateWhere(s: SparkSession, dir: String): DataFrame = {
    val table = graft.util.TempDirs.create("graft_delta_updw")
    val src = new ParquetDirectorySource(s, s"$dir/nation.parquet", "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.delta.DeltaConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    graft.formats.delta.DeltaDeletes.updateWhere(s, table,
      col("n_nationkey") % 4 === 0,
      Map("n_nationkey" -> (col("n_nationkey") + 1000)))
    new graft.formats.delta.DeltaConversionSource(s, table, "nation")
      .toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"))
  }

  val deltaUpdateWhereSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(CASE WHEN n_nationkey % 4 = 0 THEN n_nationkey + 1000
      |               ELSE n_nationkey END) AS BIGINT) AS sum_key
      |FROM nation""".stripMargin

  /** MERGE INTO (upsert): matched rows DV-masked and re-written, fresh
    * rows inserted, ONE commit. The oracle recomputes the merged table
    * with the same UPDATE-SET-* / INSERT-* semantics.
    */
  def deltaMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val table = graft.util.TempDirs.create("graft_delta_merge")
    val src = new ParquetDirectorySource(s, s"$dir/nation.parquet", "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.delta.DeltaConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    val nation = s.read.parquet(s"$dir/nation.parquet")
    val source = nation.filter(col("n_nationkey") % 3 === 0)
      .withColumn("n_regionkey", col("n_regionkey") + 100)
      .unionByName(nation.filter(col("n_nationkey") % 5 === 0)
        .withColumn("n_nationkey", col("n_nationkey") + 500))
    graft.formats.delta.DeltaDeletes.mergeInto(s, table, source,
      Seq("n_nationkey"))
    new graft.formats.delta.DeltaConversionSource(s, table, "nation")
      .toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"),
        sum(col("n_regionkey")).cast("long").as("sum_region"))
  }

  val deltaMergeUpsertSql: String =
    """WITH src AS (
      |  SELECT n_nationkey, n_name, n_regionkey + 100 AS n_regionkey
      |  FROM nation WHERE n_nationkey % 3 = 0
      |  UNION ALL
      |  SELECT n_nationkey + 500, n_name, n_regionkey
      |  FROM nation WHERE n_nationkey % 5 = 0
      |), merged AS (
      |  SELECT * FROM src
      |  UNION ALL
      |  SELECT * FROM nation
      |  WHERE n_nationkey NOT IN (SELECT n_nationkey FROM src)
      |)
      |SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
      |  CAST(sum(n_regionkey) AS BIGINT) AS sum_region
      |FROM merged""".stripMargin

  /** Row-level UPDATE on Iceberg via a single row-delta snapshot: a
    * full-tuple equality delete masks the old rows and the re-written
    * rows land at the SAME sequence number (the spec's ordering rule
    * makes them survive the delete). Mirrors `delta_update_where`.
    */
  def icebergUpdateWhere(s: SparkSession, dir: String): DataFrame = {
    val table = graft.util.TempDirs.create("graft_ice_updw")
    val src = new ParquetDirectorySource(s, s"$dir/nation.parquet", "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    graft.formats.iceberg.IcebergDeletes.updateWhere(s, table,
      col("n_nationkey") % 4 === 0,
      Map("n_nationkey" -> (col("n_nationkey") + 1000)))
    new graft.formats.iceberg.IcebergConversionSource(s, table, "nation")
      .toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"))
  }

  val icebergUpdateWhereSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(CASE WHEN n_nationkey % 4 = 0 THEN n_nationkey + 1000
      |               ELSE n_nationkey END) AS BIGINT) AS sum_key
      |FROM nation""".stripMargin

  /** UPDATE on a FORMAT-VERSION 3 table with row lineage preserved: the
    * table upgrades v2→3 (every existing entry gets an explicit
    * first_row_id, next-row-id watermarked), a DV delete masks the keys
    * ≡ 1 (mod 5), then updateWhere rewrites the keys ≡ 0 (mod 4) — the
    * rewrite materializes each matched row's _row_id (spec §Row
    * Lineage: an update is the same row at a new sequence). The gate
    * asserts the id set is EXACTLY the pre-update live set (no forked
    * or dropped lineage) before aggregating the served rows.
    */
  def icebergV3UpdateWhere(s: SparkSession, dir: String): DataFrame = {
    import graft.formats.iceberg._
    val table = graft.util.TempDirs.create("graft_icev3_updw")
    val src = new ParquetDirectorySource(s, s"$dir/nation.parquet", "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new IcebergConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    require(IcebergDeletes.upgradeToV3(s, table))
    def ids(): Set[Long] = {
      val m = IcebergMetadata.read(table,
        IcebergMetadata.currentVersion(table).get)
      IcebergRowLineage.keyedScanWithLineage(s, table, m,
        m.headSequence, "nation")
        .select(col("__row_id")).collect().map(_.getLong(0)).toSet
    }
    IcebergDeletes.deleteWhere(s, table, col("n_nationkey") % 5 === 1)
    val pre = ids()
    IcebergDeletes.updateWhere(s, table,
      col("n_nationkey") % 4 === 0,
      Map("n_nationkey" -> (col("n_nationkey") + 1000)))
    require(ids() == pre,
      "update on v3 must preserve the live row-id set exactly")
    new IcebergConversionSource(s, table, "nation")
      .toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"))
  }

  /** v3 ROW LINEAGE surfaced through the unified reader: nation synced
    * as ONE sorted data file and upgraded (ids assigned positionally —
    * id == rank of the key over ALL 25 rows), then an UPDATE that must
    * keep ids and a DV DELETE that must not renumber survivors. The
    * read serves each surviving key with its ORIGINAL rank as `_row_id`
    * — re-ranking after the delete, forked ids on update, or a
    * scan/manifest position mismatch all hash-fail.
    */
  def icebergV3RowLineage(s: SparkSession, dir: String): DataFrame = {
    import graft.formats.iceberg._
    val stage = graft.util.TempDirs.create("graft_icev3lin_src")
    s.read.parquet(s"$dir/nation.parquet")
      .repartition(1).sortWithinPartitions("n_nationkey")
      .write.mode("overwrite").parquet(stage)
    val table = graft.util.TempDirs.create("graft_icev3lin_tbl")
    val src = new ParquetDirectorySource(s, stage, "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new IcebergConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    require(IcebergDeletes.upgradeToV3(s, table))
    IcebergDeletes.updateWhere(s, table, col("n_nationkey") % 7 === 3,
      Map("n_regionkey" -> (col("n_regionkey") + 10)))
    IcebergDeletes.deleteWhere(s, table, col("n_nationkey") % 5 === 2)
    s.read.format("graft").option("withRowLineage", "true").load(table)
      .select(col("n_nationkey"), col("_row_id").as("rid"))
  }

  val icebergV3RowLineageSql: String =
    """SELECT n_nationkey, rid FROM (
      |  SELECT n_nationkey,
      |    CAST(row_number() OVER (ORDER BY n_nationkey) - 1 AS BIGINT)
      |      AS rid
      |  FROM nation)
      |WHERE n_nationkey % 5 <> 2""".stripMargin

  /** Delta ROW TRACKING end-to-end (PROTOCOL.md §Row Tracking —
    * the Delta sibling of [[icebergV3RowLineage]], same closed-form
    * oracle): nation as ONE sorted file, `enable` backfills ids
    * positionally (id == rank of the key), then an UPDATE that must
    * keep the updated row's id (materialized into its replacement
    * file), a DV DELETE that must not renumber survivors, and an
    * OPTIMIZE whose rewrite must preserve every id through the
    * materialized column. Re-ranking, forked ids, or a lost
    * materialization all hash-fail against the oracle.
    */
  def deltaRowTracking(s: SparkSession, dir: String): DataFrame = {
    import graft.formats.delta._
    val stage = graft.util.TempDirs.create("graft_deltart_src")
    s.read.parquet(s"$dir/nation.parquet")
      .repartition(1).sortWithinPartitions("n_nationkey")
      .write.mode("overwrite").parquet(stage)
    val table = graft.util.TempDirs.create("graft_deltart_tbl")
    val src = new ParquetDirectorySource(s, stage, "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    DeltaRowTracking.enable(s, table)
    DeltaDeletes.updateWhere(s, table, col("n_nationkey") % 7 === 3,
      Map("n_regionkey" -> (col("n_regionkey") + 10)))
    DeltaDeletes.deleteWhere(s, table, col("n_nationkey") % 5 === 2)
    // the compaction retires the DV and rewrites every surviving row —
    // ids must ride the materialized column through it
    DeltaOptimize.compact(s, table,
      targetFileBytes = 1L << 30, minFileBytes = 1L << 20)
    s.read.format("graft").option("withRowLineage", "true").load(table)
      .select(col("n_nationkey"), col("_row_id").as("rid"))
  }

  /** Identical closed form to the Iceberg v3 lineage oracle: ids are
    * ranks over the sorted 25 keys; %5==2 keys are deleted.
    */
  val deltaRowTrackingSql: String = icebergV3RowLineageSql

  val icebergV3UpdateWhereSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(CASE WHEN n_nationkey % 4 = 0 THEN n_nationkey + 1000
      |               ELSE n_nationkey END) AS BIGINT) AS sum_key
      |FROM nation WHERE n_nationkey % 5 <> 1""".stripMargin

  /** MERGE INTO on Iceberg: key-equality delete + every source row as
    * new data files, one snapshot, one sequence. Mirrors
    * `delta_merge_upsert` (same source, same oracle).
    */
  def icebergMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val table = graft.util.TempDirs.create("graft_ice_merge")
    val src = new ParquetDirectorySource(s, s"$dir/nation.parquet", "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    val nation = s.read.parquet(s"$dir/nation.parquet")
    val source = nation.filter(col("n_nationkey") % 3 === 0)
      .withColumn("n_regionkey", col("n_regionkey") + 100)
      .unionByName(nation.filter(col("n_nationkey") % 5 === 0)
        .withColumn("n_nationkey", col("n_nationkey") + 500))
    graft.formats.iceberg.IcebergDeletes.mergeInto(s, table, source,
      Seq("n_nationkey"))
    new graft.formats.iceberg.IcebergConversionSource(s, table, "nation")
      .toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"),
        sum(col("n_regionkey")).cast("long").as("sum_region"))
  }

  val icebergMergeUpsertSql: String = deltaMergeUpsertSql

  /** Hudi MERGE_ON_READ real-time view end-to-end: nation as the base
    * file, an UPSERT written as avro log blocks (updates keyed %3 with
    * n_regionkey+100, inserts +500 for %5), then the `snapshot`
    * (real-time) read merges log records over the base scan by record
    * key — the view the reference reads through
    * `hoodie.datasource.query.type=snapshot`. Same merge scenario and
    * oracle as the Delta/Iceberg MERGE gates.
    */
  def hudiMorRealtimeRead(s: SparkSession, dir: String): DataFrame = {
    import graft.formats.hudi._
    val hudiDir = graft.util.TempDirs.create("graft_hudi_rt")
    Files.copy(Paths.get(s"$dir/nation.parquet"),
      Paths.get(hudiDir, "base1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val base = s"$hudiDir/base1.parquet"
    val nation = s.read.parquet(base)
    HudiTimeline.writeProperties(hudiDir, "nation", "MERGE_ON_READ")
    require(HudiTimeline.writeCommit(HudiTimeline.CommitMeta("100", "commit",
      Map("" -> Seq(HudiTimeline.WriteStat(HudiTimeline.fileId(base),
        "base1.parquet", nation.count(), Files.size(Paths.get(base))))),
      Map.empty, Map("schema" -> nation.schema.json)), hudiDir))

    val source = nation.filter(col("n_nationkey") % 3 === 0)
      .withColumn("n_regionkey", col("n_regionkey") + 100)
      .unionByName(nation.filter(col("n_nationkey") % 5 === 0)
        .withColumn("n_nationkey", col("n_nationkey") + 500))
    graft.util.PhaseTimer.time("hudi_mor_realtime_read.upsert") {
      HudiLogFiles.upsert(s, hudiDir, source, Seq("n_nationkey"))
    }

    new HudiConversionSource(s, hudiDir, "nation", "snapshot").toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"),
        sum(col("n_regionkey")).cast("long").as("sum_region"))
  }

  val hudiMorRealtimeReadSql: String = deltaMergeUpsertSql

  /** Hudi 1.x TIMELINE-LAYOUT read end-to-end: the gate authors a table
    * version 8 table in the real 1.x dialect — active timeline under
    * `.hoodie/timeline/`, completed instants named
    * `<requestTime>_<completionTime>.<action>`, commit metadata as AVRO
    * object containers (HoodieCommitMetadata + the replace variant) — and
    * the engine must read it: three instants where the replacecommit
    * clusters the even-doc file into a doc_id%4==0 file, so the served
    * rows are exactly (doc_id odd) ∪ (doc_id%4==0). The reference gets
    * this capability from the Hudi 1.2.0 library (root pom.xml:73,
    * HudiConversionSource.java:57-341); graft reads the layout natively.
    */
  def hudiV1TimelineRead(s: SparkSession, dir: String): DataFrame = {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import graft.formats.hudi._

    val table = graft.util.TempDirs.create("graft_hudi_v1")
    val docs = s.read.parquet(s"$dir/documents.parquet")

    // real-dialect properties: version 8, layout 2, timeline path
    Files.write(Files.createDirectories(
        Paths.get(table, ".hoodie")).resolve("hoodie.properties"),
      ("hoodie.table.name=docs_v1\nhoodie.table.type=COPY_ON_WRITE\n" +
        "hoodie.table.version=8\nhoodie.timeline.layout.version=2\n" +
        "hoodie.timeline.path=timeline\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val tl = Files.createDirectories(Paths.get(table, ".hoodie", "timeline"))

    def stage(df: DataFrame, fileId: String, instant: String): (String, Long, Long) = {
      val tmp = graft.util.TempDirs.create("graft_hudi_v1_stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val rows = df.count()
      val name = s"${fileId}_0-1-2_$instant.parquet"
      Files.move(part.toPath, Paths.get(table, name),
        StandardCopyOption.REPLACE_EXISTING)
      (name, rows, Files.size(Paths.get(table, name)))
    }

    val statSchema = new Schema.Parser().parse(
      """{"type":"record","name":"HoodieWriteStat","namespace":
        |"org.apache.hudi.avro.model","fields":[
        |{"name":"fileId","type":["null","string"],"default":null},
        |{"name":"path","type":["null","string"],"default":null},
        |{"name":"prevCommit","type":["null","string"],"default":null},
        |{"name":"numWrites","type":["null","long"],"default":null},
        |{"name":"numDeletes","type":["null","long"],"default":null},
        |{"name":"totalWriteBytes","type":["null","long"],"default":null},
        |{"name":"partitionPath","type":["null","string"],"default":null},
        |{"name":"fileSizeInBytes","type":["null","long"],"default":null}
        |]}""".stripMargin.replace("\n", ""))
    def commitSchema(replace: Boolean) = new Schema.Parser().parse(
      (s"""{"type":"record","name":"Hoodie${if (replace) "Replace" else ""}CommitMetadata","namespace":
        |"org.apache.hudi.avro.model","fields":[
        |{"name":"partitionToWriteStats","type":["null",{"type":"map",
        |"values":{"type":"array","items":${statSchema.toString}}}],"default":null},
        |{"name":"extraMetadata","type":["null",{"type":"map",
        |"values":["null","string"]}],"default":null},
        |{"name":"version","type":["null","int"],"default":null},
        |{"name":"operationType","type":["null","string"],"default":null},
        |{"name":"compacted","type":["null","boolean"],"default":null}""" +
        (if (replace)
          """,{"name":"partitionToReplaceFileIds","type":["null",
            |{"type":"map","values":{"type":"array","items":"string"}}],
            |"default":null}""" else "") +
        "]}").stripMargin.replace("\n", ""))

    def writeAvroCommit(instant: String, completion: String, action: String,
        stats: Seq[(String, String, Long, Long)],
        replaced: Seq[String]): Unit = {
      val isReplace = action == "replacecommit"
      val schema = commitSchema(isReplace)
      val rec = new GenericData.Record(schema)
      val statList = new java.util.ArrayList[GenericRecord]()
      stats.foreach { case (fid, path, rows, size) =>
        val sr = new GenericData.Record(statSchema)
        sr.put("fileId", fid); sr.put("path", path)
        sr.put("numWrites", java.lang.Long.valueOf(rows))
        sr.put("numDeletes", java.lang.Long.valueOf(0L))
        sr.put("totalWriteBytes", java.lang.Long.valueOf(size))
        sr.put("partitionPath", "")
        sr.put("fileSizeInBytes", java.lang.Long.valueOf(size))
        statList.add(sr)
      }
      val pws = new java.util.HashMap[String, AnyRef]()
      pws.put("", statList)
      rec.put("partitionToWriteStats", pws)
      val extra = new java.util.HashMap[String, AnyRef]()
      extra.put("schema", docs.schema.json)
      rec.put("extraMetadata", extra)
      rec.put("version", java.lang.Integer.valueOf(1))
      rec.put("operationType", if (isReplace) "CLUSTER" else "INSERT")
      rec.put("compacted", java.lang.Boolean.FALSE)
      if (isReplace) {
        val pr = new java.util.HashMap[String, AnyRef]()
        val ids = new java.util.ArrayList[String]()
        replaced.foreach(ids.add)
        pr.put("", ids)
        rec.put("partitionToReplaceFileIds", pr)
      }
      Files.createFile(tl.resolve(s"$instant.$action.requested"))
      Files.createFile(tl.resolve(s"$instant.$action.inflight"))
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, tl.resolve(s"${instant}_$completion.$action").toFile)
      try { w.append(rec) } finally w.close()
    }

    val fidEven = "aaaa0000-1111-4222-8333-000000000001-0"
    val fidOdd = "bbbb0000-1111-4222-8333-000000000002-0"
    val fidQuad = "cccc0000-1111-4222-8333-000000000003-0"
    val (evenName, evenRows, evenSize) =
      stage(docs.filter(col("doc_id") % 2 === 0), fidEven, "20240501100000001")
    writeAvroCommit("20240501100000001", "20240501100000900", "commit",
      Seq((fidEven, evenName, evenRows, evenSize)), Nil)
    val (oddName, oddRows, oddSize) =
      stage(docs.filter(col("doc_id") % 2 === 1), fidOdd, "20240501110000001")
    writeAvroCommit("20240501110000001", "20240501110000900", "commit",
      Seq((fidOdd, oddName, oddRows, oddSize)), Nil)
    val (quadName, quadRows, quadSize) =
      stage(docs.filter(col("doc_id") % 4 === 0), fidQuad, "20240501120000001")
    writeAvroCommit("20240501120000001", "20240501120000900", "replacecommit",
      Seq((fidQuad, quadName, quadRows, quadSize)), Seq(fidEven))

    require(HudiTimeline.isV1Layout(table))
    new HudiConversionSource(s, table, "docs_v1").toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("doc_id")).cast("long").as("sum_id"),
        countDistinct(col("lang")).cast("long").as("n_langs"))
  }

  val hudiV1TimelineReadSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      |FROM documents WHERE doc_id % 2 = 1 OR doc_id % 4 = 0""".stripMargin

  /** Row-level DELETE on a Hudi MOR table via DeleteBlock tombstones,
    * plus the revive rule: base → upsert (the merge scenario) → DELETE
    * even keys → re-upsert keys %10 (region+1000). The tombstone wins
    * over older records, the later upsert wins over the tombstone —
    * Hudi's latest-instant-wins payload ordering, end to end through
    * the real-time read.
    */
  def hudiDeleteWhere(s: SparkSession, dir: String): DataFrame = {
    import graft.formats.hudi._
    val hudiDir = graft.util.TempDirs.create("graft_hudi_del")
    Files.copy(Paths.get(s"$dir/nation.parquet"),
      Paths.get(hudiDir, "base1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val base = s"$hudiDir/base1.parquet"
    val nation = s.read.parquet(base)
    HudiTimeline.writeProperties(hudiDir, "nation", "MERGE_ON_READ")
    require(HudiTimeline.writeCommit(HudiTimeline.CommitMeta("100", "commit",
      Map("" -> Seq(HudiTimeline.WriteStat(HudiTimeline.fileId(base),
        "base1.parquet", nation.count(), Files.size(Paths.get(base))))),
      Map.empty, Map("schema" -> nation.schema.json)), hudiDir))

    val source = nation.filter(col("n_nationkey") % 3 === 0)
      .withColumn("n_regionkey", col("n_regionkey") + 100)
      .unionByName(nation.filter(col("n_nationkey") % 5 === 0)
        .withColumn("n_nationkey", col("n_nationkey") + 500))
    HudiLogFiles.upsert(s, hudiDir, source, Seq("n_nationkey"))
    HudiLogFiles.deleteWhere(s, hudiDir, col("n_nationkey") % 2 === 0)
    HudiLogFiles.upsert(s, hudiDir,
      nation.filter(col("n_nationkey") % 10 === 0)
        .withColumn("n_regionkey", col("n_regionkey") + 1000),
      Seq("n_nationkey"))

    new HudiConversionSource(s, hudiDir, "nation", "snapshot").toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"),
        sum(col("n_regionkey")).cast("long").as("sum_region"))
  }

  val hudiDeleteWhereSql: String =
    """WITH src AS (
      |  SELECT n_nationkey, n_name, n_regionkey + 100 AS n_regionkey
      |  FROM nation WHERE n_nationkey % 3 = 0
      |  UNION ALL
      |  SELECT n_nationkey + 500, n_name, n_regionkey
      |  FROM nation WHERE n_nationkey % 5 = 0
      |), merged AS (
      |  SELECT * FROM src
      |  UNION ALL
      |  SELECT * FROM nation
      |  WHERE n_nationkey NOT IN (SELECT n_nationkey FROM src)
      |), afterdel AS (
      |  SELECT * FROM merged WHERE n_nationkey % 2 <> 0
      |), revive AS (
      |  SELECT n_nationkey, n_name, n_regionkey + 1000 AS n_regionkey
      |  FROM nation WHERE n_nationkey % 10 = 0
      |), final AS (
      |  SELECT * FROM revive
      |  UNION ALL
      |  SELECT * FROM afterdel
      |  WHERE n_nationkey NOT IN (SELECT n_nationkey FROM revive)
      |)
      |SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
      |  CAST(sum(n_regionkey) AS BIGINT) AS sum_region
      |FROM final""".stripMargin

  /** Hudi incremental query through the unified reader: commit(f1) →
    * commit(f2) → replacecommit(−f1, +f3), then the feed from the first
    * instant must serve exactly f2 and f3 (the replaced group never
    * surfaces), each row tagged with its writing instant.
    */
  def hudiChangesFeed(s: SparkSession, dir: String): DataFrame = {
    val dataDir = graft.util.TempDirs.create("graft_hcf_data")
    val hudiDir = graft.util.TempDirs.create("graft_hcf_hudi")
    val srcFile = Paths.get(s"$dir/nation.parquet")
    def addFile(name: String, mtime: Long): Unit = {
      Files.copy(srcFile, Paths.get(dataDir, name),
        StandardCopyOption.REPLACE_EXISTING)
      Paths.get(dataDir, name).toFile.setLastModified(mtime)
    }
    def psrc = new ParquetDirectorySource(s, dataDir, "nation")
    val hudiTgt = new graft.formats.hudi.HudiConversionTarget(s, hudiDir)
    def hudiCommit(): Unit = {
      val o = TableFormatSync.syncSnapshot(Seq(hudiTgt),
        psrc.currentSnapshot(), psrc.sourceFormat)
      require(o.forall(_.status == "SUCCESS"), o.mkString(";"))
    }
    addFile("f1.parquet", 1000000L); hudiCommit()
    addFile("f2.parquet", 2000000L); hudiCommit()
    Files.delete(Paths.get(dataDir, "f1.parquet"))
    addFile("f3.parquet", 3000000L); hudiCommit()
    val first = graft.formats.hudi.HudiTimeline.listInstants(hudiDir).head
    s.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", first).load(hudiDir)
      .agg(count(lit(1)).as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"),
        countDistinct(col("_commit_instant")).as("n_instants"))
  }

  val hudiChangesFeedSql: String =
    """SELECT 2*count(*) AS cnt,
      |  CAST(2*sum(n_nationkey) AS BIGINT) AS sum_key,
      |  CAST(2 AS BIGINT) AS n_instants
      |FROM nation""".stripMargin

  /** The DataFrameWriter surface: append ×2 then overwrite through
    * `df.write.format("graft")`, read back through the same format — the
    * final state must be exactly the overwrite's rows, and the history
    * metadata table must show all three commits.
    */
  def graftWriterDelta(s: SparkSession, dir: String): DataFrame = {
    val t = graft.util.TempDirs.create("graft_writer_delta")
    val nation = s.read.parquet(s"$dir/nation.parquet")
    nation.write.format("graft").mode("append").save(t)
    nation.withColumn("n_nationkey", col("n_nationkey") + 100)
      .write.format("graft").mode("append").save(t)
    nation.filter(col("n_nationkey") % 2 === 0)
      .write.format("graft").mode("overwrite").save(t)
    val hist = s.read.format("graft").option("metaTable", "history").load(t)
    require(hist.count() == 3, s"expected 3 commits, got ${hist.count()}")
    s.read.format("graft").load(t)
      .agg(count(lit(1)).as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"))
  }

  val graftWriterDeltaSql: String =
    """SELECT count(*) AS cnt, CAST(sum(n_nationkey) AS BIGINT) AS sum_key
      |FROM nation WHERE n_nationkey % 2 = 0""".stripMargin

  /** The same DataFrameWriter cycle (append ×2 then overwrite) landing
    * in ICEBERG, HUDI and PAIMON via `option("tableFormat", ...)` —
    * each format's final state must be exactly the overwrite's rows and
    * its history must show three commits. One gate, three metadata
    * planes, identical row semantics.
    */
  def graftWriterFormats(s: SparkSession, dir: String): DataFrame = {
    val nation = s.read.parquet(s"$dir/nation.parquet")
    // three independent format legs (fresh table each) — concurrent
    // submission per guide §2.6; serial wall-clock summed the legs
    val perFmt = graft.util.Par.map(Seq("hudi", "iceberg", "paimon")) { fmt =>
      // per-format phase timing (bench `phases` key): a single-format
      // regression must attribute, not hide inside the 3-format total
      // (legs overlap, so phases sum past the gate's wall-clock)
      graft.util.PhaseTimer.time(s"graft_writer_formats.$fmt") {
        val t = graft.util.TempDirs.create(s"graft_writer_$fmt")
        nation.write.format("graft").option("tableFormat", fmt)
          .mode("append").save(t)
        nation.withColumn("n_nationkey", col("n_nationkey") + 100)
          .write.format("graft").option("tableFormat", fmt)
          .mode("append").save(t)
        nation.filter(col("n_nationkey") % 2 === 0)
          .write.format("graft").option("tableFormat", fmt)
          .mode("overwrite").save(t)
        val hist = s.read.format("graft").option("metaTable", "history")
          .load(t)
        require(hist.count() >= 3,
          s"$fmt: expected >=3 commits, got ${hist.count()}")
        s.read.format("graft").load(t)
          .agg(count(lit(1)).as("cnt"),
            sum(col("n_nationkey")).cast("long").as("sum_key"))
          .withColumn("fmt", lit(fmt))
      }
    }
    perFmt.reduce(_ unionByName _).orderBy("fmt")
  }

  val graftWriterFormatsSql: String =
    """SELECT count(*) AS cnt, CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
      |  f.fmt
      |FROM nation, (SELECT unnest(['hudi','iceberg','paimon']) AS fmt) f
      |WHERE n_nationkey % 2 = 0 GROUP BY f.fmt ORDER BY f.fmt""".stripMargin

  /** Hudi RESTORE (savepoint semantics): upsert + delete pile log files
    * onto the base commit, then restoreTo the base instant rolls both
    * back — their log files physically deleted, the timeline rewound —
    * and the real-time read must serve exactly the original rows.
    */
  def hudiRestoreRead(s: SparkSession, dir: String): DataFrame = {
    import graft.formats.hudi._
    val hudiDir = graft.util.TempDirs.create("graft_hudi_restore")
    Files.copy(Paths.get(s"$dir/nation.parquet"),
      Paths.get(hudiDir, "base1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val base = s"$hudiDir/base1.parquet"
    val nation = s.read.parquet(base)
    HudiTimeline.writeProperties(hudiDir, "nation", "MERGE_ON_READ")
    require(HudiTimeline.writeCommit(HudiTimeline.CommitMeta("100", "commit",
      Map("" -> Seq(HudiTimeline.WriteStat(HudiTimeline.fileId(base),
        "base1.parquet", nation.count(), Files.size(Paths.get(base))))),
      Map.empty, Map("schema" -> nation.schema.json)), hudiDir))

    HudiLogFiles.upsert(s, hudiDir,
      nation.withColumn("n_regionkey", col("n_regionkey") + 100),
      Seq("n_nationkey"))
    HudiLogFiles.deleteWhere(s, hudiDir, col("n_nationkey") % 2 === 0)

    val res = HudiMaintenance.restoreTo(s, hudiDir, "100")
    require(res.rolledBack.size == 2 && res.deletedFiles >= 1, res.toString)
    require(HudiTimeline.listInstants(hudiDir) == Seq("100"),
      HudiTimeline.listInstants(hudiDir).toString)

    new HudiConversionSource(s, hudiDir, "nation", "snapshot").toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"),
        sum(col("n_regionkey")).cast("long").as("sum_region"))
  }

  val hudiRestoreReadSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
      |  CAST(sum(n_regionkey) AS BIGINT) AS sum_region
      |FROM nation""".stripMargin

  /** Compaction absorbs MOR logs (upserts AND tombstones) into new base
    * files, then the previously-refused file-level path works again:
    * sync the compacted table to Delta and read it back — proof the
    * delete semantics survive into a file listing.
    */
  def hudiCompactSync(s: SparkSession, dir: String): DataFrame = {
    import graft.formats.hudi._
    val hudiDir = graft.util.TempDirs.create("graft_hudi_cpt")
    val deltaDir = graft.util.TempDirs.create("graft_hudi_cpt_delta")
    Files.copy(Paths.get(s"$dir/nation.parquet"),
      Paths.get(hudiDir, "base1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val base = s"$hudiDir/base1.parquet"
    val nation = s.read.parquet(base)
    HudiTimeline.writeProperties(hudiDir, "nation", "MERGE_ON_READ")
    require(HudiTimeline.writeCommit(HudiTimeline.CommitMeta("100", "commit",
      Map("" -> Seq(HudiTimeline.WriteStat(HudiTimeline.fileId(base),
        "base1.parquet", nation.count(), Files.size(Paths.get(base))))),
      Map.empty, Map("schema" -> nation.schema.json)), hudiDir))

    val source = nation.filter(col("n_nationkey") % 3 === 0)
      .withColumn("n_regionkey", col("n_regionkey") + 100)
      .unionByName(nation.filter(col("n_nationkey") % 5 === 0)
        .withColumn("n_nationkey", col("n_nationkey") + 500))
    HudiLogFiles.upsert(s, hudiDir, source, Seq("n_nationkey"))
    HudiLogFiles.deleteWhere(s, hudiDir, col("n_nationkey") % 2 === 0)
    require(HudiLogFiles.compact(s, hudiDir) > 0, "compaction was a no-op")

    val src = new HudiConversionSource(s, hudiDir, "nation")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(s, deltaDir)), src.currentSnapshot(),
      src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    new DeltaConversionSource(s, deltaDir, "nation").toDataFrame
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("n_nationkey")).cast("long").as("sum_key"),
        sum(col("n_regionkey")).cast("long").as("sum_region"))
  }

  val hudiCompactSyncSql: String =
    """WITH src AS (
      |  SELECT n_nationkey, n_name, n_regionkey + 100 AS n_regionkey
      |  FROM nation WHERE n_nationkey % 3 = 0
      |  UNION ALL
      |  SELECT n_nationkey + 500, n_name, n_regionkey
      |  FROM nation WHERE n_nationkey % 5 = 0
      |), merged AS (
      |  SELECT * FROM src
      |  UNION ALL
      |  SELECT * FROM nation
      |  WHERE n_nationkey NOT IN (SELECT n_nationkey FROM src)
      |)
      |SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(n_nationkey) AS BIGINT) AS sum_key,
      |  CAST(sum(n_regionkey) AS BIGINT) AS sum_region
      |FROM merged WHERE n_nationkey % 2 <> 0""".stripMargin

  /** ORC base files end-to-end (reference FileFormat.java:27-29): customer
    * written as ORC, the directory source lists it and reads ORC file-tail
    * stats, the sync lands it in Iceberg with file_format=ORC, and the
    * unified reader scans it through Spark's ORC reader — same aggregate
    * oracle as the parquet-sourced Paimon sync.
    */
  def orcSourceSync(s: SparkSession, dir: String): DataFrame = {
    val orcDir = graft.util.TempDirs.create("graft_orc_src") + "/t"
    s.read.parquet(s"$dir/customer.parquet").write.orc(orcDir)
    val table = graft.util.TempDirs.create("graft_orc_ice")
    val src = new ParquetDirectorySource(s, orcDir, "customer")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    new graft.formats.iceberg.IcebergConversionSource(s, table, "customer")
      .toDataFrame
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        Gate.sumMeasure(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  val orcSourceSyncSql: String = syncParquetToPaimonSql

  /** Avro base files end-to-end (the third reference file format,
    * FileFormat.java:27-29): customer written as avro container files
    * (one per executor slice, avro-core), the directory source reads the
    * writer schema from the container header and counts rows from block
    * headers, the Iceberg sync registers them as AVRO data files, and
    * the read-back decodes records through the avro scan.
    */
  def avroSourceSync(s: SparkSession, dir: String): DataFrame = {
    val avroDir = graft.util.TempDirs.create("graft_avro_src")
    val customer = s.read.parquet(s"$dir/customer.parquet")
    val schemaJson = customer.schema.json
    val bconf = graft.util.HadoopConfs.broadcastSession(s)
    val ad = avroDir
    customer.repartition(2).rdd.mapPartitionsWithIndex { (i, it) =>
      val sch = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      Iterator.single(graft.sources.AvroFiles.write(
        s"$ad/part-$i.avro", bconf.value.value, sch, it))
    }.collect()   // O(partitions): per-file record counts only
    val table = graft.util.TempDirs.create("graft_avro_ice")
    val src = new ParquetDirectorySource(s, avroDir, "customer")
    val outcomes = TableFormatSync.syncSnapshot(
      Seq(new graft.formats.iceberg.IcebergConversionTarget(s, table)),
      src.currentSnapshot(), src.sourceFormat)
    require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    new graft.formats.iceberg.IcebergConversionSource(s, table, "customer")
      .toDataFrame
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        Gate.sumMeasure(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  val avroSourceSyncSql: String = syncParquetToPaimonSql

  /** Hudi time travel through the UNIFIED reader (reference
    * ITConversionController.java:454-506 exercises historical-instant
    * reads across formats): two commits (f1, then f1+f2), then
    * `versionAsOf = <first instant>` AND `timestampAsOf = <epoch of the
    * first instant>` must both serve exactly commit 1's rows while the
    * head serves both files.
    */
  def timeTravelHudi(s: SparkSession, dir: String): DataFrame = {
    val dataDir = graft.util.TempDirs.create("graft_tth_data")
    val hudiDir = graft.util.TempDirs.create("graft_tth_hudi")
    val srcFile = Paths.get(s"$dir/region.parquet")
    def addFile(name: String, mtime: Long): Unit = {
      Files.copy(srcFile, Paths.get(dataDir, name),
        StandardCopyOption.REPLACE_EXISTING)
      Paths.get(dataDir, name).toFile.setLastModified(mtime)
    }
    def psrc = new ParquetDirectorySource(s, dataDir, "region")
    val tgt = new graft.formats.hudi.HudiConversionTarget(s, hudiDir)
    def commit(): Unit = {
      val o = TableFormatSync.syncSnapshot(Seq(tgt),
        psrc.currentSnapshot(), psrc.sourceFormat)
      require(o.forall(_.status == "SUCCESS"), o.mkString(";"))
    }
    addFile("f1.parquet", 1000000L)
    commit()
    addFile("f2.parquet", 2000000L)
    commit()
    val instants = graft.formats.hudi.HudiTimeline.listInstants(hudiDir)
    require(instants.size == 2, instants.toString)
    val v1 = s.read.format("graft")
      .option("versionAsOf", instants.head).load(hudiDir)
      .agg(count(lit(1)).as("v1_rows"))
    // the first instant is real formatted wall-clock: its own epoch is a
    // deterministic cut BETWEEN the commits (instant2 is strictly later)
    val cut = java.time.Instant.from(graft.formats.hudi.HudiTimeline
      .InstantFormat.parse(instants.head)).toEpochMilli
    val ts = s.read.format("graft")
      .option("timestampAsOf", cut.toString).load(hudiDir)
      .agg(count(lit(1)).as("ts_rows"))
    val latest = s.read.format("graft").load(hudiDir)
      .agg(count(lit(1)).as("latest_rows"))
    v1.crossJoin(ts).crossJoin(latest)
  }

  val timeTravelHudiSql: String =
    """SELECT count(*) AS v1_rows, count(*) AS ts_rows,
      |  2*count(*) AS latest_rows FROM region""".stripMargin

  /** Paimon time travel through the unified reader: snapshot ids resolve
    * via `versionAsOf`, wall-clock via `timestampAsOf` against the
    * snapshots' recorded timeMillis.
    */
  def timeTravelPaimon(s: SparkSession, dir: String): DataFrame = {
    val dataDir = graft.util.TempDirs.create("graft_ttp_data")
    val paiDir = graft.util.TempDirs.create("graft_ttp_paimon")
    val srcFile = Paths.get(s"$dir/region.parquet")
    def addFile(name: String, mtime: Long): Unit = {
      Files.copy(srcFile, Paths.get(dataDir, name),
        StandardCopyOption.REPLACE_EXISTING)
      Paths.get(dataDir, name).toFile.setLastModified(mtime)
    }
    def psrc = new ParquetDirectorySource(s, dataDir, "region")
    val tgt = new graft.formats.paimon.PaimonConversionTarget(s, paiDir)
    def commit(): Unit = {
      val o = TableFormatSync.syncSnapshot(Seq(tgt),
        psrc.currentSnapshot(), psrc.sourceFormat)
      require(o.forall(_.status == "SUCCESS"), o.mkString(";"))
    }
    addFile("f1.parquet", 1000000L)
    commit()
    Thread.sleep(5)   // snapshot timeMillis must differ for the ts read
    addFile("f2.parquet", 2000000L)
    commit()
    require(graft.formats.paimon.PaimonFormat.latestSnapshotId(paiDir)
      .contains(2L))
    val v1 = s.read.format("graft")
      .option("versionAsOf", "1").load(paiDir)
      .agg(count(lit(1)).as("v1_rows"))
    val cut = graft.formats.paimon.PaimonFormat
      .readSnapshot(paiDir, 1L).timeMillis
    val ts = s.read.format("graft")
      .option("timestampAsOf", cut.toString).load(paiDir)
      .agg(count(lit(1)).as("ts_rows"))
    val latest = s.read.format("graft").load(paiDir)
      .agg(count(lit(1)).as("latest_rows"))
    v1.crossJoin(ts).crossJoin(latest)
  }

  val timeTravelPaimonSql: String = timeTravelHudiSql

  /** Iceberg partition-spec EVOLUTION end-to-end (spec v2 §Partition
    * Evolution): half of documents lands under spec 0 (identity `lang`),
    * the other half under the evolved spec 1 (identity `source`). The
    * metadata must carry BOTH specs — default-spec-id = 1 with spec 0
    * archived, manifests keeping the spec id they were written under
    * (manifest-list field 502) — and the mixed-spec table must serve every
    * row exactly once with identity columns read from the DATA files
    * (real-Iceberg semantics: metadata partition values are per-file
    * constants only where the file's own spec defines them).
    */
  def icebergSpecEvolution(s: SparkSession, dir: String): DataFrame = {
    import graft.formats.iceberg._
    import graft.model._
    val table = graft.util.TempDirs.create("graft_spec_evo")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val schema = docs.schema

    // full-column files (identity partition sources stay IN the data, as
    // real Iceberg writers require) with explicit metadata values. ONE
    // write job for all keys: partitionBy on a COPY of the key column so
    // the layout routes per key while the data keeps every column, plus
    // one aggregate job for the per-key row counts — never a
    // filter+write pair per key.
    def stageBy(df: DataFrame, keyCol: String): Seq[FileEntry] = {
      val tmp = graft.util.TempDirs.create("graft_spec_stage")
      df.withColumn("__k", col(keyCol)).repartition(col("__k"))
        .write.partitionBy("__k").mode("overwrite").parquet(tmp)
      val counts = df.groupBy(keyCol).agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // Spark escapes partition values in directory names (space, ':',
      // '%', … → %XX, same scheme as Hive's escapePathName): unescape
      // before the counts lookup or any value needing escaping would
      // throw NoSuchElementException and record a wrong partition value
      def unescapePartitionValue(s0: String): String = {
        val sb = new StringBuilder(s0.length)
        var i = 0
        while (i < s0.length) {
          val c = s0.charAt(i)
          if (c == '%' && i + 2 < s0.length) {
            val hex = s0.substring(i + 1, i + 3)
            try { sb.append(Integer.parseInt(hex, 16).toChar); i += 3 }
            catch { case _: NumberFormatException => sb.append(c); i += 1 }
          } else { sb.append(c); i += 1 }
        }
        sb.toString
      }
      new java.io.File(tmp).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("__k="))
        .sortBy(_.getName).toSeq.flatMap { d =>
          val k = unescapePartitionValue(d.getName.stripPrefix("__k="))
          d.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
            .map { f =>
              // two keys served by one task share the task's file name
              // across partition dirs — key-prefix the flat destination
              val dst = Paths.get(s"$table/data", s"$k-${f.getName}")
              Files.createDirectories(dst.getParent)
              Files.move(f.toPath, dst)
              FileEntry(dst.toString, Files.size(dst), counts(k), "parquet",
                Seq(PartitionMember(keyCol, k)), Nil,
                System.currentTimeMillis())
            }
        }
    }

    def syncAll(files: Seq[FileEntry], specCol: String,
        commit: String): Unit = {
      import s.implicits._
      val td = TableDescriptor("documents", TableFormats.Parquet, table,
        schema, Seq(PartitionFieldSpec(specCol, Transform.Value)),
        Layout.HivePartitioned, System.currentTimeMillis())
      val outcomes = TableFormatSync.syncSnapshot(
        Seq(new IcebergConversionTarget(s, table)),
        TableSnapshot(td, s.createDataset(files), commit), "PARQUET")
      require(outcomes.forall(_.status == "SUCCESS"), outcomes.mkString(";"))
    }

    val batch1 = stageBy(docs.filter(col("doc_id") % 2 === 0), "lang")
    syncAll(batch1, "lang", "evo-c1")
    val batch2 = stageBy(docs.filter(col("doc_id") % 2 === 1), "source")
    syncAll(batch1 ++ batch2, "source", "evo-c2")

    // evolution invariants — the gate proves the metadata plane, not just
    // the row totals
    val m = IcebergMetadata.read(table,
      IcebergMetadata.currentVersion(table).get)
    require(m.defaultSpecId == 1 && m.otherSpecs.size == 1,
      s"spec not evolved: default=${m.defaultSpecId} others=${m.otherSpecs.size}")
    val ids = IcebergManifests.readManifestListRecords(
        m.currentSnapshot.get.manifestList)
      .filter(IcebergManifests.contentOf(_) == 0)
      .map(_.get("partition_spec_id").asInstanceOf[Int]).distinct.sorted
    require(ids == Seq(0, 1), s"manifest spec ids $ids")

    s.read.format("graft").load(table)
      .filter(col("n_chars") > 0)
      .groupBy("source")
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("source")
  }

  val icebergSpecEvolutionSql: String =
    """SELECT source, count(*) AS cnt,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE n_chars > 0 GROUP BY source ORDER BY source""".stripMargin
}
