package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.formats.delta._
import graft.sources.ParquetDirectorySource
import graft.streaming.ChangeFeedStream
import graft.sync.TableFormatSync

/** Checkpointed incremental change-feed consumption: every commit's
  * changes delivered exactly once across restarts, redelivered on
  * callback failure, never redelivered after success.
  */
class ChangeFeedStreamSpec extends SparkSuite {

  private def freshTable(prefix: String): String = {
    val dataDir = tmpDir(s"${prefix}_data")
    spark.read.parquet(sf("sf0.001") + "/nation.parquet")
      .repartition(2).write.mode("overwrite").parquet(dataDir)
    val target = tmpDir(s"${prefix}_delta")
    val src = new ParquetDirectorySource(spark, dataDir, "nation")
    val out = TableFormatSync.syncSnapshot(
      Seq(new DeltaConversionTarget(spark, target)),
      src.currentSnapshot(), src.sourceFormat)
    assert(out.forall(_.status == "SUCCESS"))
    target
  }

  test("catch-up delivers each commit once; caught-up stream delivers nothing") {
    val table = freshTable("cfs_catchup")
    val v0 = DeltaChanges.enableChangeDataFeed(spark, table)
    val nDel = DeltaDeletes.deleteWhere(spark, table, col("n_regionkey") === 0)
    val nUpd = DeltaDeletes.updateWhere(spark, table,
      col("n_regionkey") === 1,
      Map("n_name" -> upper(col("n_name"))))
    assert(nDel > 0 && nUpd > 0)

    val seen = ArrayBuffer.empty[(Long, Long, Map[String, Long])]
    val stream = new ChangeFeedStream(spark, table, tmpDir("cfs_ckpt"),
      startingVersion = Some(v0))
    def fn(df: org.apache.spark.sql.DataFrame, a: Long, b: Long): Unit =
      seen += ((a, b, df.groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap))

    assert(stream.deliverOnce(fn) == 2L)   // delete + update versions
    assert(stream.deliverOnce(fn) == 0L)
    assert(seen.size == 1)
    val (from, to, byType) = seen.head
    assert(from == v0 && to == v0 + 2)
    assert(byType == Map("delete" -> nDel,
      "update_preimage" -> nUpd, "update_postimage" -> nUpd), byType.toString)
  }

  test("a restarted stream resumes from the checkpoint, never redelivering") {
    val table = freshTable("cfs_resume")
    val v0 = DeltaChanges.enableChangeDataFeed(spark, table)
    DeltaDeletes.deleteWhere(spark, table, col("n_regionkey") === 2)
    val ckpt = tmpDir("cfs_resume_ckpt")
    var batches = 0
    val s1 = new ChangeFeedStream(spark, table, ckpt,
      startingVersion = Some(v0))
    assert(s1.deliverOnce((_, _, _) => batches += 1) == 1L)

    // restart: same checkpoint, no startingVersion needed
    val s2 = new ChangeFeedStream(spark, table, ckpt)
    assert(s2.deliverOnce((_, _, _) => batches += 1) == 0L)
    DeltaDeletes.deleteWhere(spark, table, col("n_regionkey") === 3)
    val deliveredRange = ArrayBuffer.empty[(Long, Long)]
    assert(s2.deliverOnce((_, a, b) => deliveredRange += ((a, b))) == 1L)
    assert(deliveredRange == Seq((v0 + 1, v0 + 2)))
    assert(batches == 1)
    // the offset must ADVANCE in place (an offset stuck at its first
    // write would redeliver forever)
    assert(s2.lastDelivered == v0 + 2)
    assert(s2.deliverOnce((_, _, _) => fail("redelivered")) == 0L)
  }

  test("a failed batch keeps the offset and is redelivered") {
    val table = freshTable("cfs_retry")
    val v0 = DeltaChanges.enableChangeDataFeed(spark, table)
    DeltaDeletes.deleteWhere(spark, table, col("n_regionkey") === 4)
    val stream = new ChangeFeedStream(spark, table, tmpDir("cfs_retry_ckpt"),
      startingVersion = Some(v0))
    intercept[RuntimeException] {
      stream.deliverOnce((_, _, _) => throw new RuntimeException("sink down"))
    }
    assert(stream.lastDelivered == v0)
    var rows = 0L
    assert(stream.deliverOnce((df, _, _) => rows = df.count()) == 1L)
    assert(rows > 0)
  }

  test("the timer loop picks up commits that land mid-stream") {
    val table = freshTable("cfs_timer")
    val v0 = DeltaChanges.enableChangeDataFeed(spark, table)
    val delivered = new java.util.concurrent.atomic.AtomicLong(0)
    val stream = new ChangeFeedStream(spark, table, tmpDir("cfs_timer_ckpt"),
      intervalMillis = 150L, startingVersion = Some(v0))
      .start((df, _, _) => delivered.addAndGet(df.count()))
    try {
      val n = DeltaDeletes.deleteWhere(spark, table, col("n_regionkey") <= 1)
      assert(n > 0)
      val deadline = System.currentTimeMillis() + 30000
      while (delivered.get() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(stream.error.isEmpty, stream.error.toString)
      assert(delivered.get() == n, s"delivered ${delivered.get()} want $n")
    } finally stream.stop()
  }
}
