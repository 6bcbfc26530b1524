package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.orc.{ColumnStatistics, OrcFile, TypeDescription}

import graft.model.FileColumnStat

/** ORC file-tail (footer) stats — the ORC twin of the parquet footer
  * reader: record count and per-column min/max/null-count in the same
  * canonical string encoding, so every downstream consumer (Delta stats
  * JSON, Iceberg byte bounds, stat-based file skipping) works unchanged
  * for ORC base files. Reference models ORC data files in
  * FileFormat.java:27-29; Spark ships the `orc-core` reader.
  *
  * ORC's file tail holds one ColumnStatistics per flattened schema id
  * (root struct = 0, fields numbered by pre-order walk), already merged
  * across stripes — no per-row-group merge needed.
  */
object OrcFooters {

  def readFooterStats(path: String, conf: Configuration,
      columns: Option[Set[String]] = None)
      : (Long, Seq[FileColumnStat]) = {
    val reader = OrcFile.createReader(new Path(path),
      OrcFile.readerOptions(conf))
    try {
      val rows = reader.getNumberOfRows
      val stats = reader.getStatistics
      val schema = reader.getSchema
      val out = Seq.newBuilder[FileColumnStat]
      walk(schema, prefix = "", rows, stats, columns, out)
      (rows, out.result())
    } finally reader.close()
  }

  /** Pre-order walk emitting one stat row per PRIMITIVE column (dotted
    * paths for nested structs, matching the parquet reader's naming).
    */
  private def walk(t: TypeDescription, prefix: String, rows: Long,
      stats: Array[ColumnStatistics], columns: Option[Set[String]],
      out: scala.collection.mutable.Builder[FileColumnStat, Seq[FileColumnStat]])
      : Unit = t.getCategory match {
    case TypeDescription.Category.STRUCT =>
      val names = t.getFieldNames
      val kids = t.getChildren
      var i = 0
      while (i < kids.size()) {
        val name = if (prefix.isEmpty) names.get(i)
          else s"$prefix.${names.get(i)}"
        walk(kids.get(i), name, rows, stats, columns, out)
        i += 1
      }
    case TypeDescription.Category.LIST | TypeDescription.Category.MAP |
        TypeDescription.Category.UNION =>
      // container internals carry no skippable bounds — same as the
      // parquet reader's primitive-only stat surface
      ()
    case _ if prefix.nonEmpty && columns.forall(_.contains(prefix)) =>
      val s = stats(t.getId)
      val nonNull = s.getNumberOfValues
      val (mn, mx) = bounds(s)
      out += FileColumnStat(prefix, mn, mx,
        numNulls = math.max(0L, rows - nonNull),
        numValues = nonNull,
        totalSize = s.getBytesOnDisk)
    case _ => ()
  }

  /** Canonical min/max strings, matching the parquet encoder: integers
    * and floats via toString, dates as ISO local dates, timestamps as
    * epoch MICROS, decimals as plain strings, strings verbatim. Boolean
    * and binary columns carry counts only in ORC — no bounds.
    */
  private def bounds(s: ColumnStatistics)
      : (Option[String], Option[String]) = s match {
    case i: org.apache.orc.IntegerColumnStatistics =>
      if (s.getNumberOfValues == 0) (None, None)
      else (Some(i.getMinimum.toString), Some(i.getMaximum.toString))
    case d: org.apache.orc.DoubleColumnStatistics =>
      if (s.getNumberOfValues == 0) (None, None)
      else (Some(d.getMinimum.toString), Some(d.getMaximum.toString))
    case st: org.apache.orc.StringColumnStatistics =>
      (Option(st.getMinimum), Option(st.getMaximum))
    case dt: org.apache.orc.DateColumnStatistics =>
      (Option(dt.getMinimumLocalDate).map(_.toString),
        Option(dt.getMaximumLocalDate).map(_.toString))
    case ts: org.apache.orc.TimestampColumnStatistics =>
      (Option(ts.getMinimum).map(m =>
          (m.getTime * 1000L + (m.getNanos / 1000) % 1000).toString),
        Option(ts.getMaximum).map(m =>
          (m.getTime * 1000L + (m.getNanos / 1000) % 1000).toString))
    case dc: org.apache.orc.DecimalColumnStatistics =>
      (Option(dc.getMinimum).map(_.toString),
        Option(dc.getMaximum).map(_.toString))
    case _ => (None, None)
  }
}
