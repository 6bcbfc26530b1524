package graft.util

import scala.reflect.ClassTag

import org.apache.spark.sql.Dataset

/** The [[StreamedLines]] fused-probe shape for TYPED rows: ONE job that
  * materializes the dataset's pin and ships, per partition, the row
  * count, a caller-chosen weight sum, and up to `cap / numPartitions`
  * rows. Commit writers that need "how many entries, how many records,
  * and — when small — the entries themselves" answer all three from this
  * single scheduler round-trip instead of a count job + an aggregate job
  * + per-partition `toLocalIterator` jobs.
  *
  * Driver memory stays ≤ `cap` rows. A dataset past the cap returns
  * `rows = None` (counts and weights are still exact); callers keep
  * their distributed path for that case, so nothing O(rows) ever lands
  * on the driver.
  */
object ProbedRows {

  case class Probe[T](count: Long, weight: Long, rows: Option[Seq[T]])

  def probe[T: ClassTag](ds: Dataset[T], weight: T => Long,
      cap: Long = 65536L): Probe[T] = {
    val rdd = ds.rdd
    val n = rdd.getNumPartitions
    if (n == 0) return Probe(0L, 0L, Some(Nil))
    val perPart = math.max(1L, cap / n)
    val parts: Array[(Array[T], Long, Long)] =
      rdd.sparkContext.runJob(rdd, (it: Iterator[T]) => {
        val buf = scala.collection.mutable.ArrayBuffer.empty[T]
        var c = 0L
        var w = 0L
        while (it.hasNext) {
          val r = it.next(); c += 1; w += weight(r)
          if (c <= perPart) buf += r
        }
        (buf.toArray, c, w)
      })
    val count = parts.map(_._2).sum
    val sum = parts.map(_._3).sum
    val complete = parts.forall { case (taken, c, _) => c <= taken.length }
    Probe(count, sum,
      if (complete) Some(parts.iterator.flatMap(_._1).toSeq) else None)
  }
}
