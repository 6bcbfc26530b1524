package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.model.{AvroSchemas, FileColumnStat}

/** Avro object-container data files — the third base-file format the
  * reference models (FileFormat.java:27-29, alongside parquet and ORC).
  *
  * Avro is a ROW format: the container header carries the writer schema,
  * and blocks carry record counts, but there are no column bounds — so
  * the stats surface is rows-only (stat-based file skipping simply never
  * prunes an avro file, which is conservative and correct; Spark's own
  * avro reader has the same property). Record ⇄ Row conversion reuses
  * the MOR log-file codec (`HudiLogFiles.rowToRecord`/`recordToRow`).
  */
object AvroFiles {

  private def open(path: String, conf: Configuration)
      : DataFileReader[GenericRecord] = {
    val in = new org.apache.avro.mapred.FsInput(new Path(path), conf)
    new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
  }

  /** The container's writer schema as a Spark StructType. */
  def sparkSchemaOf(path: String, conf: Configuration): StructType = {
    val r = open(path, conf)
    try AvroSchemas.toSpark(r.getSchema).asInstanceOf[StructType]
    finally r.close()
  }

  /** Row count + (empty) column stats — the footer-reader contract the
    * parquet/ORC twins fill with bounds. Counting sums per-block record
    * counts by seeking sync markers, never decoding a record.
    */
  def readFooterStats(path: String, conf: Configuration)
      : (Long, Seq[FileColumnStat]) = {
    val r = open(path, conf)
    try {
      var rows = 0L
      while (r.hasNext) {
        val n = r.getBlockCount
        if (n > 0) { rows += n; r.nextBlock() }
        else { r.next(); rows += 1 }
      }
      (rows, Nil)
    } finally r.close()
  }

  /** Decode every record of `path` as Rows of `schema` (missing fields
    * pad null — schema evolution reads older files with NULL columns).
    */
  def readRows(path: String, conf: Configuration, schema: StructType)
      : Iterator[Row] = {
    val r = open(path, conf)
    new Iterator[Row] {
      private var closed = false
      def hasNext: Boolean = {
        val h = !closed && r.hasNext
        if (!h && !closed) { r.close(); closed = true }
        h
      }
      def next(): Row =
        graft.formats.hudi.HudiLogFiles.recordToRow(r.next(), schema)
    }
  }

  /** Write `rows` (shaped by `schema`) as one avro container file;
    * returns the record count.
    */
  def write(path: String, conf: Configuration, schema: StructType,
      rows: Iterator[Row]): Long = {
    val avro = AvroSchemas.fromSpark(schema)
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, false)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avro))
    var n = 0L
    try {
      w.create(avro, out)
      rows.foreach { r =>
        w.append(graft.formats.hudi.HudiLogFiles.rowToRecord(r, schema, avro))
        n += 1
      }
    } finally w.close()
    n
  }
}
