package graft.formats.delta

import java.time.LocalDateTime
import java.time.format.DateTimeFormatterBuilder
import java.time.temporal.ChronoField

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}
import org.apache.spark.sql.types._

import graft.model.FileColumnStat
import graft.util.Jsons

/** Delta per-file stats JSON codec:
  * `{"numRecords":N,"minValues":{...},"maxValues":{...},"nullCount":{...}}`
  * with struct columns nested (reference DeltaStatsUtils.java:96-180,
  * value coding DeltaValueConverter.java:46-53,205-235: NaN/±Infinity by
  * name, timestamps as `yyyy-MM-dd HH:mm:ss[.ffffff]` UTC, dates ISO).
  */
object DeltaStats {

  private val tsFormat = new DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd HH:mm:ss")
    .optionalStart()
    .appendFraction(ChronoField.MICRO_OF_SECOND, 0, 6, true)
    .optionalEnd()
    .toFormatter

  private def microsToString(micros: Long): String =
    LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC).format(tsFormat)

  private def stringToMicros(s: String): Long = {
    val ldt = LocalDateTime.parse(s, tsFormat)
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
  }

  private def leafFields(schema: StructType, prefix: String = "")
      : Seq[(String, DataType)] =
    schema.fields.toSeq.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case s: StructType => leafFields(s, name)
        case dt => Seq(name -> dt)
      }
    }

  /** Canonical stat string → Delta stats JSON node. */
  private def toNode(canon: String, dt: DataType, nf: JsonNodeFactory): JsonNode =
    dt match {
      case IntegerType | ShortType | ByteType => nf.numberNode(canon.toInt)
      case LongType => nf.numberNode(canon.toLong)
      case FloatType =>
        val f = canon.toFloat
        if (f.isNaN || f.isInfinite) nf.textNode(canon) else nf.numberNode(f)
      case DoubleType =>
        val d = canon.toDouble
        if (d.isNaN || d.isInfinite) nf.textNode(canon) else nf.numberNode(d)
      case BooleanType => nf.booleanNode(canon.toBoolean)
      case _: DecimalType => nf.numberNode(new java.math.BigDecimal(canon))
      case TimestampType | TimestampNTZType =>
        nf.textNode(microsToString(canon.toLong))
      case _ => nf.textNode(canon)       // string, date ISO, binary hex
    }

  /** Delta stats JSON node → canonical stat string. */
  private def fromNode(n: JsonNode, dt: DataType): String = dt match {
    case TimestampType | TimestampNTZType =>
      if (n.isTextual) stringToMicros(n.asText).toString else n.asText
    case FloatType | DoubleType => n.asText   // handles "NaN" strings + numbers
    case _ => n.asText
  }

  private def setNested(root: ObjectNode, path: String, v: JsonNode): Unit = {
    val parts = path.split('.')
    var cur = root
    for (p <- parts.dropRight(1)) {
      cur = cur.get(p) match {
        case o: ObjectNode => o
        case _ => val o = cur.putObject(p); o
      }
    }
    cur.set[JsonNode](parts.last, v)
  }

  private def getNested(root: JsonNode, path: String): Option[JsonNode] = {
    var cur: JsonNode = root
    for (p <- path.split('.')) {
      if (cur == null) return None
      cur = cur.get(p)
    }
    Option(cur).filterNot(_.isNull)
  }

  /** Build the stats JSON string for one file. */
  def toJson(schema: StructType, numRecords: Long,
      stats: Seq[FileColumnStat]): String = {
    val nf = JsonNodeFactory.instance
    val root = nf.objectNode()
    root.put("numRecords", numRecords)
    val minV = root.putObject("minValues")
    val maxV = root.putObject("maxValues")
    val nullC = root.putObject("nullCount")
    val byField = stats.map(s => s.field -> s).toMap
    for ((name, dt) <- leafFields(schema); s <- byField.get(name)) {
      s.min.foreach(v => setNested(minV, name, toNode(v, dt, nf)))
      s.max.foreach(v => setNested(maxV, name, toNode(v, dt, nf)))
      setNested(nullC, name, nf.numberNode(s.numNulls))
    }
    Jsons.mapper.writeValueAsString(root)
  }

  /** Parse a stats JSON string → (numRecords, per-column canonical stats). */
  def parse(schema: StructType, statsJson: String)
      : (Long, Seq[FileColumnStat]) = {
    if (statsJson == null || statsJson.isEmpty) return (0L, Nil)
    val root = Jsons.mapper.readTree(statsJson)
    val numRecords = Option(root.get("numRecords")).map(_.asLong).getOrElse(0L)
    val minV = root.get("minValues"); val maxV = root.get("maxValues")
    val nullC = root.get("nullCount")
    val stats = leafFields(schema).flatMap { case (name, dt) =>
      val mn = if (minV == null) None
        else getNested(minV, name).map(fromNode(_, dt))
      val mx = if (maxV == null) None
        else getNested(maxV, name).map(fromNode(_, dt))
      val nulls = if (nullC == null) 0L
        else getNested(nullC, name).map(_.asLong).getOrElse(0L)
      if (mn.isEmpty && mx.isEmpty && nulls == 0L) None
      else Some(FileColumnStat(name, mn, mx, nulls, numRecords, 0L))
    }
    (numRecords, stats)
  }
}
