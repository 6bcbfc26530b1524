// COMPILE-ONLY SIGNATURE STUB of the public Hudi sync SPI surface that
// GraftHudiSyncTool.scala extends — Hudi jars are not on this repo's
// offline classpath; `sbt hudiSyncTool/compile` pins the tool against
// signature drift in graft's sync API. A deployment drops this stub and
// compiles against the real `org.apache.hudi:hudi-sync-common` (same
// package, class and method shapes — mirrored from the public Hudi
// source: hudi-sync/hudi-sync-common/src/main/java/org/apache/hudi/
// sync/common/HoodieSyncTool.java).
package org.apache.hudi.sync.common

import java.util.Properties

import org.apache.hadoop.conf.Configuration

/** Public Hudi SPI: a foreign Hudi writer instantiates every class named
  * in `hoodie.meta.sync.classes` reflectively with (Properties,
  * Configuration) and calls `syncHoodieTable()` after each commit.
  */
abstract class HoodieSyncTool(protected val props: Properties,
    protected val hadoopConf: Configuration) extends AutoCloseable {
  def syncHoodieTable(): Unit
  override def close(): Unit = ()
}

object HoodieSyncConfig {
  /** The key Hudi's meta-sync machinery sets to the table base path. */
  val META_SYNC_BASE_PATH = "hoodie.datasource.meta.sync.base.path"
}
