package graft.formats.iceberg

import java.nio.{ByteBuffer, ByteOrder}
import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.types._

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
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getLong.toString
    case FloatType =>
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getFloat.toString
    case DoubleType =>
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getDouble.toString
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
        // Iceberg bucket = (murmur3_x86_32(value) & Int.MaxValue) % n;
        // xxhash-based substitute kept deterministic and engine-internal
        val n = numBuckets.getOrElse(16)
        (scala.util.hashing.MurmurHash3.stringHash(canonSource, 0)
          & Int.MaxValue) % n
      case other => throw new IllegalArgumentException(s"transform $other")
    }
  }
}
