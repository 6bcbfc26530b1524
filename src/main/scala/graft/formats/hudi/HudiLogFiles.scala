package graft.formats.hudi

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.AvroSchemas
import graft.util.PathUtils

/** Hudi MERGE_ON_READ log files: avro data blocks appended to a file
  * group between compactions, merged into the base file at read time —
  * the write-side of the real-time (`snapshot`) view the reference reads
  * through `hoodie.datasource.query.type=snapshot`
  * (ITHudiConversionSource real-time assertions; log-file naming
  * HudiTimeline.isLogFile / FSUtils.LOG_FILE_PATTERN).
  *
  * Block container modeled on Hudi's HoodieLogFormat: `#HUDI#` magic,
  * version, block type, header map (instant time + writer schema), then
  * length-prefixed avro-binary records. Self-consistent write/read pair;
  * byte-compatibility with Hudi's own reader is NOT claimed (Hudi's exact
  * framing has per-release variations) — the table layout, naming,
  * timeline actions and merge SEMANTICS are the Hudi ones.
  *
  * Scale shape: upsert routes rows to their owning file group with a
  * distributed key→group join (the record-index role); one executor task
  * per file group writes that group's log file; the real-time read is
  * base-scan anti-join log-keys union latest-log-records — broadcast-able
  * joins, no driver materialization of rows.
  */
object HudiLogFiles {

  private val Magic = "#HUDI#".getBytes(StandardCharsets.US_ASCII)
  private val FormatVersion = 1
  private val AvroDataBlock = 4

  val RecordKeyFieldsProp = "hoodie.table.recordkey.fields"

  // ------------------------------------------------------ block codec

  /** Append one avro data block holding `records` to `path` (creates the
    * file with the block when absent); returns (recordCount, fileSize).
    */
  def writeLogFile(conf: Configuration, path: String, schema: Schema,
      instant: String, records: Iterator[GenericRecord]): (Long, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val body = new ByteArrayOutputStream()
    val bodyOut = new DataOutputStream(body)
    bodyOut.writeInt(FormatVersion)
    bodyOut.writeInt(AvroDataBlock)
    val headers = Seq("INSTANT_TIME" -> instant, "SCHEMA" -> schema.toString)
    bodyOut.writeInt(headers.size)
    headers.foreach { case (k, v) => bodyOut.writeUTF(k); writeBlob(bodyOut, v) }
    val writer = new GenericDatumWriter[GenericRecord](schema)
    var n = 0L
    val recBytes = new ByteArrayOutputStream()
    val content = new ByteArrayOutputStream()
    val contentOut = new DataOutputStream(content)
    records.foreach { r =>
      recBytes.reset()
      val enc = EncoderFactory.get().binaryEncoder(recBytes, null)
      writer.write(r, enc)
      enc.flush()
      contentOut.writeInt(recBytes.size())
      recBytes.writeTo(contentOut)
      n += 1
    }
    bodyOut.writeLong(n)
    bodyOut.writeInt(content.size())
    content.writeTo(bodyOut)
    bodyOut.flush()

    // append where the FS supports it; otherwise rewrite-with-suffix
    // (ChecksumFileSystem/object stores — Hudi's own writer rolls to a
    // new log version there; upserts here always name a fresh version,
    // so this path only serves multi-block writes to one file)
    val out = if (!fs.exists(p)) fs.create(p, false) else {
      try fs.append(p)
      catch {
        case _: UnsupportedOperationException =>
          val existing = new ByteArrayOutputStream()
          val in = fs.open(p)
          try {
            val buf = new Array[Byte](64 * 1024)
            var r = in.read(buf)
            while (r >= 0) { existing.write(buf, 0, r); r = in.read(buf) }
          } finally in.close()
          val o = fs.create(p, true)
          existing.writeTo(o)
          o
      }
    }
    try {
      out.write(Magic)
      out.writeLong(body.size().toLong)
      body.writeTo(out)
    } finally out.close()
    (n, fs.getFileStatus(p).getLen)
  }

  /** writeUTF caps at 64k; schema JSON can exceed it — length-prefixed
    * UTF-8 blob instead.
    */
  private def writeBlob(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    out.writeInt(b.length); out.write(b)
  }

  private def readBlob(in: DataInputStream): String = {
    val len = in.readInt()
    val b = new Array[Byte](len)
    in.readFully(b)
    new String(b, StandardCharsets.UTF_8)
  }

  /** All records of a log file with their block's instant, in write
    * order. A truncated/corrupt tail block stops the scan (Hudi's
    * corrupt-block tolerance: a crashed writer must not poison the read).
    */
  def readLogFile(conf: Configuration, path: String)
      : Seq[(String, GenericRecord)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = new DataInputStream(new java.io.BufferedInputStream(fs.open(p)))
    val out = Seq.newBuilder[(String, GenericRecord)]
    try {
      var more = true
      while (more) {
        val magic = new Array[Byte](Magic.length)
        val read = in.read(magic)
        if (read < Magic.length || !java.util.Arrays.equals(magic, Magic)) {
          more = false
        } else {
          val blockLen = in.readLong()
          val block = new Array[Byte](blockLen.toInt)
          in.readFully(block)
          val b = new DataInputStream(new java.io.ByteArrayInputStream(block))
          val ver = b.readInt()
          val typ = b.readInt()
          if (ver != FormatVersion || typ != AvroDataBlock)
            throw new IllegalStateException(
              s"unsupported log block version=$ver type=$typ at $path")
          val nHeaders = b.readInt()
          val headers = (0 until nHeaders)
            .map(_ => b.readUTF() -> readBlob(b)).toMap
          val instant = headers.getOrElse("INSTANT_TIME", "")
          val schema = new Schema.Parser().parse(headers("SCHEMA"))
          val reader = new GenericDatumReader[GenericRecord](schema)
          val n = b.readLong()
          b.readInt() // content length
          var i = 0L
          while (i < n) {
            val sz = b.readInt()
            val bytes = new Array[Byte](sz)
            b.readFully(bytes)
            val dec = DecoderFactory.get().binaryDecoder(bytes, null)
            out += instant -> reader.read(null, dec)
            i += 1
          }
        }
      }
    } catch {
      case _: EOFException => // truncated tail block: serve what parsed
    } finally in.close()
    out.result()
  }

  // ------------------------------------------------ row ⇄ avro record

  def rowToRecord(row: Row, schema: StructType, avro: Schema)
      : GenericRecord = {
    val rec = new GenericData.Record(avro)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, toAvroValue(row.get(i), f.dataType,
        nonNullBranch(avro.getField(f.name).schema())))
    }
    rec
  }

  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.stream.filter(_.getType != Schema.Type.NULL).findFirst.get
    else s

  private def toAvroValue(v: Any, dt: DataType, avro: Schema): AnyRef =
    v match {
      case null => null
      case _ => dt match {
        case BooleanType | IntegerType | LongType | FloatType | DoubleType =>
          v.asInstanceOf[AnyRef]
        case ShortType => Int.box(v.asInstanceOf[Short].toInt)
        case ByteType => Int.box(v.asInstanceOf[Byte].toInt)
        case StringType => v.toString
        case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
        case DateType =>
          Int.box(v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
        case TimestampType =>
          val ts = v.asInstanceOf[java.sql.Timestamp]
          Long.box(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000)
        case s: StructType => rowToRecord(v.asInstanceOf[Row], s, avro)
        case a: ArrayType =>
          val el = nonNullBranch(avro.getElementType)
          val out = new java.util.ArrayList[AnyRef]()
          v.asInstanceOf[scala.collection.Seq[Any]]
            .foreach(x => out.add(toAvroValue(x, a.elementType, el)))
          out
        case m: MapType =>
          val el = nonNullBranch(avro.getValueType)
          val out = new java.util.HashMap[String, AnyRef]()
          v.asInstanceOf[scala.collection.Map[Any, Any]]
            .foreach { case (k, x) =>
              out.put(k.toString, toAvroValue(x, m.valueType, el)) }
          out
        case other => throw new IllegalArgumentException(
          s"MOR log codec: unsupported type $other")
      }
    }

  def recordToRow(rec: GenericRecord, schema: StructType): Row =
    Row.fromSeq(schema.fields.toSeq.map(f =>
      fromAvroValue(rec.get(f.name), f.dataType)))

  private def fromAvroValue(v: AnyRef, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType => v
      case ShortType => v.asInstanceOf[Int].toShort
      case ByteType => v.asInstanceOf[Int].toByte
      case StringType => v.toString
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Int].toLong))
      case TimestampType =>
        val micros = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case s: StructType => recordToRow(v.asInstanceOf[GenericRecord], s)
      case a: ArrayType =>
        import scala.jdk.CollectionConverters._
        v.asInstanceOf[java.util.List[AnyRef]].asScala.toSeq
          .map(fromAvroValue(_, a.elementType))
      case m: MapType =>
        import scala.jdk.CollectionConverters._
        v.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala.map {
          case (k, x) => k.toString -> fromAvroValue(x, m.valueType)
        }.toMap
      case other => throw new IllegalArgumentException(
        s"MOR log codec: unsupported type $other")
    }

  // ------------------------------------------------------------ upsert

  /** Upsert `df` into a MERGE_ON_READ table as log files: each row is
    * routed to the file group that holds its key (distributed key→group
    * join over the base files — the record-index role); new keys go to
    * the first group. One log file per touched group, one `deltacommit`.
    * The read-optimized view is UNCHANGED by design; the real-time view
    * serves the merged rows. Returns the upserted row count.
    */
  def upsert(spark: SparkSession, tablePath: String, df: DataFrame,
      keyCols: Seq[String]): Long = {
    import spark.implicits._
    require(keyCols.nonEmpty, "upsert needs >= 1 key column")
    require(HudiTimeline.tableType(tablePath) == "MERGE_ON_READ",
      s"upsert writes MOR log files; $tablePath is COPY_ON_WRITE " +
        "(sync a fresh base file instead)")
    // pin (or validate) the table's record key in hoodie.properties —
    // the real-time merge is meaningless under a different key
    HudiTimeline.property(tablePath, RecordKeyFieldsProp) match {
      case Some(existing) =>
        require(existing == keyCols.mkString(","),
          s"table record key is $existing, upsert keyed $keyCols")
      case None =>
        HudiTimeline.setProperty(tablePath, RecordKeyFieldsProp,
          keyCols.mkString(","))
    }
    val src = new HudiConversionSource(spark, tablePath, "upsert-probe")
    val snap = src.currentSnapshot()
    val schema = snap.table.schema
    val missing = schema.fieldNames.toSet -- df.columns.toSet
    require(missing.isEmpty, s"upsert source lacks table columns: $missing")
    require(keyCols.forall(schema.fieldNames.contains),
      s"key columns must exist in the table schema: $keyCols")
    // cast to the TABLE's types: the avro codec and the merged read are
    // schema-exact, a widened literal (long where the table has int)
    // must not leak into the log
    val proj = df.select(schema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    val dup = proj.groupBy(keyCols.map(col): _*)
      .count().filter(col("count") > 1).limit(1).count()
    require(dup == 0L, "upsert batch has duplicate keys")

    // key → owning file group, from the base files (distributed)
    val groupOf = graft.plans.SnapshotFileIndex.listingFor(snap)
      .map(fe => (fe.path, HudiTimeline.fileId(fe.path)))
      .toDF("__scan_path", "__fid")
    val keyed = graft.formats.delta.DeltaRead
      .toKeyedDataFrame(spark, snap)
      .select(keyCols.map(col) :+ col("__scan_path"): _*)
      .join(groupOf, "__scan_path")
      .select(keyCols.map(col) :+ col("__fid"): _*)
    val firstGroup = src.fileGroupBaseInstants().toSeq.minBy(_._1)
    val routed = proj.join(keyed, keyCols, "left")
      .withColumn("__fid", coalesce(col("__fid"), lit(firstGroup._1)))

    val instant = HudiTimeline.newInstant(tablePath)
    val baseInstants = src.fileGroupBaseInstants()
    val logCounts = src.logFileCounts()
    val schemaJson = schema.json
    val avroJson = AvroSchemas.fromSpark(schema).toString
    val tp = tablePath
    val bconf = graft.util.HadoopConfs.broadcastSession(spark)
    // one task per touched file group writes that group's log file
    val statRows = routed.repartition(col("__fid"))
      .sortWithinPartitions("__fid")
      .rdd.mapPartitions { it =>
        val sch = DataType.fromJson(schemaJson).asInstanceOf[StructType]
        val avro = new Schema.Parser().parse(avroJson)
        val buf = it.buffered
        val out = Seq.newBuilder[(String, String, Long, Long)]
        while (buf.hasNext) {
          val fid = buf.head.getAs[String]("__fid")
          val rows = Iterator.continually(buf)
            .takeWhile(b => b.hasNext && b.head.getAs[String]("__fid") == fid)
            .map(_.next())
          val base = baseInstants.getOrElse(fid,
            throw new IllegalStateException(s"no base file for group $fid"))
          val version = logCounts.getOrElse(fid, 0) + 1
          val name = s".${fid}_$base.log.${version}_0-1-1"
          val (n, size) = writeLogFile(bconf.value.value, s"$tp/$name",
            avro, instant,
            rows.map(r => rowToRecord(Row.fromSeq(
              sch.fieldNames.toSeq.map(f => r.getAs[Any](f))), sch, avro)))
          out += ((fid, name, n, size))
        }
        out.result().iterator
      }.collect()   // O(touched file groups): commit metadata only

    val stats = statRows.map { case (fid, name, n, size) =>
      HudiTimeline.WriteStat(fid, name, n, size)
    }
    require(HudiTimeline.writeCommit(HudiTimeline.CommitMeta(instant,
      "deltacommit", Map("" -> stats.toSeq), Map.empty,
      Map("schema" -> schemaJson)), tablePath))
    graft.plans.SnapshotFileIndex.invalidate(snap)
    statRows.map(_._3).sum
  }

  // ------------------------------------------------ real-time read

  /** The merged (real-time) view: base rows whose key has no log record,
    * union the LATEST log record per key (instant desc, then log write
    * order desc — later blocks of the same instant win). `logFiles` are
    * (path, groupBaseInstant) of the live file slices' logs.
    */
  def mergedRead(spark: SparkSession, snap: graft.model.TableSnapshot,
      logFiles: Seq[String], keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val schema = snap.table.schema
    val bconf = graft.util.HadoopConfs.broadcastSession(spark)
    val logSchema = schema
      .add("__instant", StringType).add("__ord", LongType)
    val rdd = spark.sparkContext
      .parallelize(logFiles, math.max(1, math.min(logFiles.size, 64)))
      .mapPartitions { paths =>
        paths.flatMap { p =>
          readLogFile(bconf.value.value, p).zipWithIndex.map {
            case ((instant, rec), i) =>
              val base = recordToRow(rec, schema)
              Row.fromSeq(base.toSeq :+ instant :+ i.toLong)
          }
        }
      }
    val logDf = spark.createDataFrame(rdd, logSchema)
    val latest = logDf.withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("__instant").desc, col("__ord").desc)))
      .filter(col("__rn") === 1)
      .select(schema.fieldNames.toSeq.map(col): _*)
    val base = graft.formats.delta.DeltaRead.toDataFrame(spark, snap)
    base.join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(latest)
  }
}
