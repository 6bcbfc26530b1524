package graft.util

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Dataset, SparkSession}

/** Distributed recursive file walk: the driver lists ONE level, every
  * subtree walks in an executor task — the same driver/cluster split as
  * ParquetFooters.listingDataset, but filter-parameterized so retention
  * sweeps (Delta VACUUM, Iceberg RemoveOrphanFiles) can see every file
  * kind (DV `.bin`s, manifests, stray temp output), not just data files.
  */
object DistributedWalk {

  case class WalkedFile(path: String, size: Long, mtime: Long)

  /** Per-format metadata-plane directory names under a table root. An
    * in-place multi-format table hosts SEVERAL planes side by side (the
    * engine's core conversion mode), and a retention sweep keyed on ONE
    * plane's references must never walk a sibling plane — its files are
    * by construction absent from the sweeping plane's keep set, so the
    * sweep would destroy the sibling's metadata. Hudi's `.hoodie` (and
    * its dot-prefixed MOR log files) are hidden and always skipped by
    * the walk itself.
    */
  val MetadataPlaneDirs: Map[String, Set[String]] = Map(
    "delta" -> Set("_delta_log", "_change_data"),
    "iceberg" -> Set("metadata"),
    "paimon" -> Set("snapshot", "schema", "tag", "manifest"))

  /** Directories a sweep running through `own`'s plane must skip: every
    * OTHER format's plane (its own is governed by its keep set).
    */
  def foreignPlaneDirs(own: String): Set[String] =
    MetadataPlaneDirs.filterNot(_._1 == own).values.flatten.toSet

  /** All files under `basePath`, skipping level-1 directories matching
    * `skipDir` and files matching `skipFile` (hidden files are always
    * skipped — checksum/CRC sidecars travel with their data file).
    */
  def allFiles(spark: SparkSession, basePath: String,
      skipDir: String => Boolean = _ => false,
      skipFile: String => Boolean = _ => false): Dataset[WalkedFile] = {
    import spark.implicits._
    val conf = HadoopConfs.session(spark)
    val base = new Path(basePath)
    val fs = base.getFileSystem(conf)
    if (!fs.exists(base)) return spark.emptyDataset[WalkedFile]
    val level1 = fs.listStatus(base).toSeq
      .filterNot(s => s.getPath.getName.startsWith("."))
    val direct = level1
      .filter(s => s.isFile && !skipFile(s.getPath.getName))
      .map(s => WalkedFile(PathUtils.canonical(s.getPath.toString),
        s.getLen, s.getModificationTime))
    val dirs = level1
      .filter(s => s.isDirectory && !skipDir(s.getPath.getName))
      .map(_.getPath.toString)
    if (dirs.isEmpty) return spark.createDataset(direct)
    val parallelism = math.max(1,
      math.min(dirs.size, spark.sparkContext.defaultParallelism * 2))
    val bconf = HadoopConfs.broadcastSession(spark)
    val skipF = skipFile
    val walked = graft.util.Par.ds(spark, dirs, parallelism)
      .mapPartitions { it =>
        val c = bconf.value.value
        it.flatMap { d =>
          val dp = new Path(d)
          val dfs = dp.getFileSystem(c)
          val out = Seq.newBuilder[WalkedFile]
          val iter = dfs.listFiles(dp, true)
          while (iter.hasNext) {
            val s = iter.next()
            val name = s.getPath.getName
            if (!name.startsWith(".") && !skipF(name))
              out += WalkedFile(PathUtils.canonical(s.getPath.toString),
                s.getLen, s.getModificationTime)
          }
          out.result()
        }
      }
    spark.createDataset(direct).union(walked)
  }
}
