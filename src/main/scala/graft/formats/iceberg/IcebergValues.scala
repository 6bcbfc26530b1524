package graft.formats.iceberg

import java.nio.{ByteBuffer, ByteOrder}
import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.types._

/** murmur3_x86_32 (public algorithm; Iceberg's bucket hash). */
object Murmur3 {
  def hashBytes(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51; val c2 = 0x1b873593
    var h = seed
    val nBlocks = data.length / 4
    var i = 0
    while (i < nBlocks) {
      var k = (data(4 * i) & 0xff) | ((data(4 * i + 1) & 0xff) << 8) |
        ((data(4 * i + 2) & 0xff) << 16) | ((data(4 * i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 1
    }
    var k = 0
    val tail = nBlocks * 4
    (data.length & 3) match {
      case 3 =>
        k ^= (data(tail + 2) & 0xff) << 16
        k ^= (data(tail + 1) & 0xff) << 8
        k ^= data(tail) & 0xff
      case 2 =>
        k ^= (data(tail + 1) & 0xff) << 8
        k ^= data(tail) & 0xff
      case 1 =>
        k ^= data(tail) & 0xff
      case _ =>
    }
    if ((data.length & 3) != 0) {
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
    }
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13
    h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }
}

/** Iceberg single-value binary serialization (spec Appendix D) between
  * the engine's canonical stat strings and Iceberg bound bytes — the
  * reference's Conversions.toByteBuffer usage
  * (IcebergColumnStatsConverter.java:53-87).
  */
object IcebergValues {

  def toBytes(canon: String, dt: DataType): Array[Byte] = dt match {
    case IntegerType | ShortType | ByteType =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(canon.toInt).array()
    case LongType =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(canon.toLong).array()
    case FloatType =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putFloat(canon.toFloat).array()
    case DoubleType =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putDouble(canon.toDouble).array()
    case BooleanType => Array(if (canon.toBoolean) 1.toByte else 0.toByte)
    case StringType => canon.getBytes("UTF-8")
    case DateType =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(LocalDate.parse(canon).toEpochDay.toInt).array()
    case TimestampType | TimestampNTZType =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(canon.toLong).array()                 // canonical = micros
    case d: DecimalType =>
      new java.math.BigDecimal(canon).setScale(d.scale).unscaledValue()
        .toByteArray                                   // big-endian, as spec
    case BinaryType => canon.grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    case _ => throw new IllegalArgumentException(s"unsupported bound: $dt")
  }

  def fromBytes(bytes: Array[Byte], dt: DataType): String = dt match {
    case IntegerType | ShortType | ByteType =>
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getInt.toString
    case LongType =>
      // 4-byte bound: written before an int -> long promotion (the spec
      // keeps old manifests' bounds in the WRITE-time type; readers
      // promote the stored value)
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      (if (bytes.length == 4) b.getInt.toLong else b.getLong).toString
    case FloatType =>
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getFloat.toString
    case DoubleType =>
      // 4-byte bound: pre-promotion float (see LongType note)
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      (if (bytes.length == 4) b.getFloat.toDouble else b.getDouble).toString
    case BooleanType => (bytes.nonEmpty && bytes(0) != 0).toString
    case StringType => new String(bytes, "UTF-8")
    case DateType =>
      LocalDate.ofEpochDay(
        ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong)
        .toString
    case TimestampType | TimestampNTZType =>
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getLong.toString
    case d: DecimalType =>
      new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
        .toPlainString
    case BinaryType => bytes.map("%02x".format(_)).mkString
    case _ => throw new IllegalArgumentException(s"unsupported bound: $dt")
  }

  /** Iceberg JSON single-value (spec Appendix D) → the Spark EXTERNAL
    * value `Literal.create` accepts for `dt` — used to serve v3
    * `initial-default`s. `tn` is the field's Iceberg type JSON node:
    * struct single-values are keyed by FIELD ID, which only the type
    * node resolves to positions. Refuses — naming the type — shapes the
    * engine cannot SERVE: binary/fixed defaults (the vectorized parquet
    * scan cannot fill binary existence constants; probed by
    * ExistsDefaultProbe) and types with no Spark mapping. A `uuid`
    * default arrives as (string type, canonical text) — served as the
    * string the uuid column itself reads as.
    */
  def fromJsonSingle(dt: DataType,
      tn: com.fasterxml.jackson.databind.JsonNode,
      v: com.fasterxml.jackson.databind.JsonNode, ctx: String): Any = {
    import scala.jdk.CollectionConverters._
    def bad(why: String): Nothing = throw new UnsupportedOperationException(
      s"$ctx: $why — refusing rather than serve wrong values")
    (dt, v) match {
      case (BooleanType, b) if b.isBoolean => b.asBoolean
      case (IntegerType, n) if n.isNumber => n.asInt
      case (LongType, n) if n.isNumber => n.asLong
      case (FloatType, n) if n.isNumber => n.asDouble.toFloat
      case (DoubleType, n) if n.isNumber => n.asDouble
      case (StringType, s) if s.isTextual => s.asText
      case (DateType, s) if s.isTextual => LocalDate.parse(s.asText)
      case (_: DecimalType, s) if s.isTextual || s.isNumber =>
        new java.math.BigDecimal(s.asText)
      case (TimestampType, s) if s.isTextual =>
        // spec: timestamptz single-values carry an explicit offset
        java.time.OffsetDateTime.parse(s.asText).toInstant
      case (TimestampNTZType, s) if s.isTextual =>
        java.time.LocalDateTime.parse(s.asText)
      case (st: StructType, o) if o.isObject =>
        // JSON object keyed by FIELD ID; positions resolve through the
        // type node, whose field order parseStruct preserved
        val fieldNodes = Option(tn).filter(n => n.isObject &&
            n.has("fields"))
          .map(_.get("fields").elements().asScala.toSeq)
          .getOrElse(bad("struct default needs the schema's struct " +
            "type node to resolve field ids"))
        org.apache.spark.sql.Row.fromSeq(
          st.fields.toSeq.zip(fieldNodes).map { case (sf, fn) =>
            Option(o.get(fn.get("id").asInt.toString))
              .filterNot(_.isNull)
              .map(child => fromJsonSingle(sf.dataType, fn.get("type"),
                child, s"$ctx.${sf.name}"))
              .orNull
          })
      case (a: ArrayType, arr) if arr.isArray =>
        val etn = Option(tn).filter(_.isObject).map(_.get("element")).orNull
        arr.elements().asScala.map(e =>
          if (e.isNull) null
          else fromJsonSingle(a.elementType, etn, e, s"$ctx.element"))
          .toSeq
      case (m: MapType, o)
          if o.isObject && o.has("keys") && o.has("values") =>
        val ktn = Option(tn).filter(_.isObject).map(_.get("key")).orNull
        val vtn = Option(tn).filter(_.isObject).map(_.get("value")).orNull
        val ks = o.get("keys").elements().asScala.toSeq
          .map(k => fromJsonSingle(m.keyType, ktn, k, s"$ctx.key"))
        val vs = o.get("values").elements().asScala.toSeq
          .map(x => if (x.isNull) null
            else fromJsonSingle(m.valueType, vtn, x, s"$ctx.value"))
        ks.zip(vs).toMap
      case (BinaryType, _) =>
        bad("a binary/fixed initial-default is not servable — the " +
          "vectorized parquet scan cannot fill binary existence defaults")
      case (other, node) =>
        bad(s"initial-default $node for type ${other.simpleString} is " +
          "not representable by this engine")
    }
  }

  /** Partition transform result for a canonical source value — Iceberg
    * stores time transforms as epoch-granularity ints (years/months since
    * 1970, days/hours since epoch; reference
    * IcebergPartitionValueConverter.java:58-155).
    */
  def transformValue(canonSource: String, sourceType: DataType,
      transform: String, numBuckets: Option[Int]): Any = {
    def instant: Instant = sourceType match {
      case DateType => LocalDate.parse(canonSource)
        .atStartOfDay(ZoneOffset.UTC).toInstant
      case TimestampType | TimestampNTZType =>
        Instant.EPOCH.plusNanos(canonSource.toLong * 1000L)
      case _ => throw new IllegalArgumentException(
        s"time transform over $sourceType")
    }
    transform match {
      case graft.model.Transform.Value => canonSource
      case graft.model.Transform.Year =>
        instant.atZone(ZoneOffset.UTC).getYear - 1970
      case graft.model.Transform.Month =>
        val z = instant.atZone(ZoneOffset.UTC)
        (z.getYear - 1970) * 12 + (z.getMonthValue - 1)
      case graft.model.Transform.Day =>
        Math.floorDiv(instant.getEpochSecond, 86400L).toInt
      case graft.model.Transform.Hour =>
        Math.floorDiv(instant.getEpochSecond, 3600L).toInt
      case graft.model.Transform.Bucket =>
        // Iceberg spec Appendix B: bucket = (murmur3_x86_32(serialized
        // value, seed 0) & Int.MaxValue) % n, ints hashed as 8-byte LE
        // longs, strings as UTF-8 bytes
        val n = numBuckets.getOrElse(16)
        val bytes = sourceType match {
          case StringType => canonSource.getBytes("UTF-8")
          case IntegerType | LongType | ShortType | ByteType =>
            java.nio.ByteBuffer.allocate(8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              .putLong(canonSource.toLong).array()
          case DateType =>
            java.nio.ByteBuffer.allocate(8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              .putLong(LocalDate.parse(canonSource).toEpochDay).array()
          case TimestampType | TimestampNTZType =>
            java.nio.ByteBuffer.allocate(8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              .putLong(canonSource.toLong).array()
          case _ => canonSource.getBytes("UTF-8")
        }
        (Murmur3.hashBytes(bytes, 0) & Int.MaxValue) % n
      case other => throw new IllegalArgumentException(s"transform $other")
    }
  }
}
