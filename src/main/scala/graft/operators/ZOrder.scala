package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-column Z-order (interleaved-bit) cluster keys — shared by Delta
  * OPTIMIZE ZORDER, Iceberg compaction-with-clustering, Hudi clustering
  * and Paimon compaction. The z-value is a pure Catalyst expression:
  * per-column 256-bucket range codes from ONE multi-column approxQuantile
  * pass (strings: a bounded sample), then a static shift/and/or
  * interleave tree — no UDF, no window, fully inside whole-stage codegen;
  * the only driver-side state is ≤255 cut literals per column.
  *
  * [[clusterize]] is the rewrite entry point. For the common all-numeric
  * unpartitioned case it lays rows out in ONE full-width pass: the same
  * 25%-sample that yields the per-column bucket cuts is persisted and
  * re-aggregated for equi-depth cuts over the z-value itself, each row's
  * output-file id comes from those cuts as a plain expression, and the
  * id routes to exactly one reducer through a hash-preimage map — so the
  * range partitioner's extra full evaluation of the child plan (its
  * reservoir-sampling pass) never runs. Partitioned or string-keyed
  * rewrites keep the proven repartitionByRange path.
  */
object ZOrder {

  /** count of (sorted) cuts <= value as an 8-deep binary decision tree:
    * 8 comparisons per row instead of a 255-element array scan — still a
    * pure codegen'd expression, just a logarithmic one
    */
  private def fromCuts[T](cuts: Seq[T], value: Column): Column =
    if (cuts.isEmpty) lit(0L)
    else {
      val cs = cuts.toIndexedSeq
      def go(lo: Int, hi: Int): Column =
        if (lo == hi) lit(lo.toLong)
        else {
          val mid = (lo + hi + 1) / 2
          when(value >= lit(cs(mid - 1)), go(mid, hi))
            .otherwise(go(lo, mid - 1))
        }
      when(value.isNull, lit(0L)).otherwise(go(0, cs.length))
    }

  /** orderable-numeric image of a non-string column */
  private def numericView(df: DataFrame, c: String): Option[Column] =
    df.schema(c).dataType match {
      case _: NumericType => Some(col(c).cast("double"))
      case DateType => Some(unix_date(col(c)).cast("double"))
      case TimestampType => Some(unix_micros(col(c)).cast("double"))
      case TimestampNTZType =>
        Some(unix_micros(col(c).cast(TimestampType)).cast("double"))
      case StringType => None
      case other => throw new UnsupportedOperationException(
        s"zorder on $c: unsupported type $other (numeric, date, " +
          "timestamp and string cluster; drop the column from the key)")
    }

  /** the static interleave tree over per-column bucket codes: bit i of
    * bucket j lands at position `i*ncols + j`
    */
  private def interleave(buckets: Seq[Column]): Column = {
    val n = buckets.size
    (0 until 8).foldLeft(lit(0L)) { (acc, bit) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (b, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright(b, bit).bitwiseAND(lit(1L)), bit * n + j))
      }
    }
  }

  private val QuantileProbs = (1 to 255).map(_ / 256.0).toArray

  /** The interleaved-bits cluster key: per column an 8-bit range bucket
    * (256 approximate-quantile cuts, broadcast as literals), then the
    * static interleave tree. ALL orderable-numeric columns share ONE
    * approxQuantile pass (multi-column Greenwald-Khanna); only string
    * columns need their own bounded-sample pass each.
    */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    val views = cols.map(c => c -> numericView(df, c)).toMap
    val numericCols = cols.filter(views(_).isDefined)
    val numCuts: Map[String, Seq[Double]] =
      if (numericCols.isEmpty) Map.empty
      else {
        // cuts cluster, they don't decide correctness: a seeded 25%
        // sample gives the same equi-depth layout for a fraction of the
        // quantile pass (which reads ONLY the key columns — pruned scan)
        val keyed = df.select(numericCols.zipWithIndex.map {
          case (c, i) => views(c).get.as(s"__q$i")
        }: _*)
        val sampled = keyed.sample(withReplacement = false, 0.25, seed = 41)
        val qCols = numericCols.indices.map(i => s"__q$i").toArray
        // ONE pass over the sample; small tables can sample to zero rows,
        // which approxQuantile reports as all-empty cut arrays — only
        // then pay a full-frame pass (no separate existence-probe job)
        val fromSample = sampled.stat.approxQuantile(qCols, QuantileProbs,
          0.005)
        val all = if (fromSample.forall(_.isEmpty))
          keyed.stat.approxQuantile(qCols, QuantileProbs, 0.005)
        else fromSample
        numericCols.zip(all.map(
          _.filterNot(_.isNaN).distinct.sorted.toSeq)).toMap
      }
    interleave(cols.map { c =>
      views(c) match {
        case Some(v) => fromCuts(numCuts(c), v)
        case None => fromCuts(stringCuts(df, c), col(c))
      }
    })
  }

  /** Lay `rows` out clustered by the z-order of `cols` into ~`nOut`
    * equal-row groups, each group one reducer (one output file per
    * unpartitioned write task): the rewrite entry point shared by all
    * four formats.
    *
    * All-numeric keys, unpartitioned: the single-pass plan. One sampled
    * narrow pass (25%, key columns only, persisted) yields the
    * per-column bucket cuts AND equi-depth cuts over the z-value; rows
    * then carry an explicit group id (`fromCuts` over the z-value) that
    * routes to its own reducer via a hash-preimage literal map — no
    * range partitioner, so the full-width child plan is evaluated
    * exactly once, in the shuffle-write pass itself. At any scale the
    * driver holds ≤ (255 cuts × columns + nOut cuts + nOut routes)
    * literals.
    *
    * Partitioned tables and string keys keep the repartitionByRange
    * path (the extra evaluation pass) — correctness identical, just the
    * historical plan.
    */
  def clusterize(rows: DataFrame, cols: Seq[String], nOut: Int,
      partCols: Seq[String] = Nil): DataFrame = {
    require(cols.nonEmpty, "clusterize needs >= 1 cluster column")
    val views = cols.map(c => c -> numericView(rows, c)).toMap
    if (partCols.nonEmpty || views.values.exists(_.isEmpty)) {
      // historical path: partition-aware / string-keyed range layout
      val rangeCols = partCols.map(col) :+ col("__zval")
      return rows.withColumn("__zval", zValue(rows, cols))
        .repartitionByRange(nOut, rangeCols: _*)
        .sortWithinPartitions(rangeCols: _*)
        .drop("__zval")
    }
    val keyed = rows.select(cols.zipWithIndex.map {
      case (c, i) => views(c).get.as(s"__q$i")
    }: _*)
    val qCols = cols.indices.map(i => s"__q$i").toArray
    val sampled = keyed.sample(withReplacement = false, 0.25, seed = 41)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val fromSample = sampled.stat.approxQuantile(qCols, QuantileProbs,
        0.005)
      val (cutSource, colCuts) =
        if (fromSample.forall(_.isEmpty))
          (keyed, keyed.stat.approxQuantile(qCols, QuantileProbs, 0.005))
        else (sampled, fromSample)
      val cuts = cols.indices.map(i =>
        colCuts(i).filterNot(_.isNaN).distinct.sorted.toSeq)
      def zOf(in: Seq[Column]): Column =
        interleave(cols.indices.map(i => fromCuts(cuts(i), in(i))))
      // equi-depth cuts over the z-value itself, from the SAME persisted
      // sample (z fits a double exactly: ≤ 32 interleaved bits)
      val zCuts =
        if (nOut <= 1) Seq.empty[Double]
        else cutSource
          .select(zOf(cols.indices.map(i => col(s"__q$i")))
            .cast("double").as("__z"))
          .stat.approxQuantile("__z",
            (1 until nOut).map(_.toDouble / nOut).toArray, 0.005)
          .distinct.sorted.toSeq
      val nPart = zCuts.length + 1
      val zReal = zOf(cols.map(views(_).get))
      val fid = fromCuts(zCuts, zReal.cast("double"))
      // exact group→reducer routing: literal ints whose murmur3 hash
      // (seed 42, Spark's HashPartitioning) lands each fid on its own
      // shuffle partition — searched driver-side, O(nPart·ln nPart) tries
      val routes = new Array[Int](nPart)
      val found = new Array[Boolean](nPart)
      var v = 0
      var left = nPart
      while (left > 0) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42)
        val p = ((h % nPart) + nPart) % nPart
        if (!found(p)) { found(p) = true; routes(p) = v; left -= 1 }
        v += 1
      }
      rows.withColumn("__zval", zReal)
        .withColumn("__zroute",
          element_at(typedLit(routes.toSeq), fid.cast("int") + 1))
        .repartition(nPart, col("__zroute"))
        .sortWithinPartitions("__zval")
        .drop("__zval", "__zroute")
    } finally sampled.unpersist()
  }

  /** ≤255 evenly spaced cuts from a bounded sample (≤64k values) — the
    * same sample-the-domain move as Spark's RangePartitioner.
    */
  private def stringCuts(df: DataFrame, c: String): Seq[String] = {
    val total = math.max(1L, df.select(c).na.drop.count())
    val fraction = math.min(1.0, 65536.0 / total)
    val sampled = df.select(col(c)).na.drop
      .sample(withReplacement = false, fraction, seed = 41)
      .distinct().sort(col(c)).collect().map(_.getString(0))
    val step = math.max(1, sampled.length / 255)
    sampled.zipWithIndex
      .collect { case (v, i) if i % step == 0 => v }.take(255).toSeq
  }

}
