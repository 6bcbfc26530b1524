package graft

import java.nio.file.{Files, Paths}

import graft.formats.iceberg._
import graft.formats.paimon._
import graft.sources.ParquetDirectorySource
import graft.sync.ConversionController

class CompactionSpec extends SparkSuite {

  private def driveCommits(target: String, fmt: String, n: Int): Unit = {
    val dataDir = tmpDir(s"${fmt}_cmp_data")
    val srcFile = Paths.get(sf("sf0.001/region.parquet"))
    val controller = new ConversionController
    for (i <- 1 to n) {
      Files.copy(srcFile, Paths.get(dataDir, s"f$i.parquet"))
      Paths.get(dataDir, s"f$i.parquet").toFile.setLastModified(i * 1000000L)
      val src = new ParquetDirectorySource(spark, dataDir, "region")
      val tgt = graft.RunSync.buildTarget(spark, fmt, target)
      val r = controller.sync(src, Seq(tgt))
      assert(r.forall(_.status == "SUCCESS"), s"commit $i: ${r.mkString(";")}")
    }
  }

  test("iceberg manifests compact past the threshold") {
    val target = tmpDir("ice_compact")
    driveCommits(target, "ICEBERG", 20)
    val src = new IcebergConversionSource(spark, target, "region")
    assert(src.currentSnapshot().files.count() == 20)
    val meta = IcebergMetadata.read(target,
      IcebergMetadata.currentVersion(target).get)
    val manifests = IcebergManifests.readManifestList(
      meta.currentSnapshot.get.manifestList)
    assert(manifests.size <= IcebergConversionTarget.CompactionThreshold + 1,
      s"${manifests.size} manifests after 20 commits")
  }

  test("paimon base manifest list compacts past the threshold") {
    val target = tmpDir("paimon_compact")
    driveCommits(target, "PAIMON", 20)
    val src = new PaimonConversionSource(spark, target, "region")
    assert(src.currentSnapshot().files.count() == 20)
    val snap = PaimonFormat.readSnapshot(target,
      PaimonFormat.latestSnapshotId(target).get)
    val base = PaimonFormat.readManifestList(snap.baseManifestList)
    assert(base.size <= 17, s"${base.size} base manifests after 20 commits")
  }
}
