package graft.model

import java.time.LocalDate

import org.apache.spark.sql.types._

/** Canonical string encoding for per-file column-stat values
  * (min/max in FileColumnStat) and partition values (PartitionMember).
  *
  * The reference carries stats as typed Objects and re-codes them per target
  * (DeltaValueConverter.java:62-235, IcebergColumnStatsConverter.java:53-120,
  * HudiFileStatsExtractor.java:253-297). We keep one canonical *string* form
  * so the file listing stays a flat, shuffle-friendly Dataset row; the table
  * schema recovers the type at the target boundary.
  *
  * Encoding: INT/LONG/SHORT/BYTE → decimal string; FLOAT/DOUBLE → JVM
  * toString (NaN/Infinity spelled out, matching Delta's stat JSON names);
  * BOOLEAN → true/false; STRING → raw; DATE → ISO yyyy-MM-dd;
  * TIMESTAMP/_NTZ → epoch micros; DECIMAL → plain string; BINARY → hex.
  */
object StatCodec {

  def encode(v: Any, dt: DataType): Option[String] = Option(v).map { x =>
    dt match {
      case DateType => x match {
        case d: java.sql.Date => d.toString
        case i: Int => LocalDate.ofEpochDay(i.toLong).toString
        case d: LocalDate => d.toString
        case other => other.toString
      }
      case TimestampType | TimestampNTZType => x match {
        case l: Long => l.toString                       // already micros
        case t: java.sql.Timestamp =>
          (t.getTime * 1000L + (t.getNanos / 1000) % 1000).toString
        case i: java.time.Instant =>
          (i.getEpochSecond * 1000000L + i.getNano / 1000).toString
        case other => other.toString
      }
      case BinaryType => x match {
        case b: Array[Byte] => b.map("%02x".format(_)).mkString
        case other => other.toString
      }
      case _: DecimalType => x match {
        case d: java.math.BigDecimal => d.toPlainString
        case d: BigDecimal => d.underlying.toPlainString
        case d: Decimal => d.toJavaBigDecimal.toPlainString
        case other => other.toString
      }
      case _ => x.toString
    }
  }

  /** Decode a canonical string back to the JVM value Spark expects for the
    * given type (java.sql.Date / java.sql.Timestamp for date/timestamp).
    */
  def decode(s: String, dt: DataType): Any = dt match {
    case IntegerType => s.toInt
    case LongType => s.toLong
    case ShortType => s.toShort
    case ByteType => s.toByte
    case FloatType => s.toFloat
    case DoubleType => s.toDouble
    case BooleanType => s.toBoolean
    case StringType => s
    case DateType => java.sql.Date.valueOf(s)
    case TimestampType | TimestampNTZType =>
      val micros = s.toLong
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case d: DecimalType => new java.math.BigDecimal(s)
    case BinaryType => s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    case _ => s
  }

  /** Ordering over canonical strings for a type — used when merging
    * row-group stats into per-file stats (ParquetStatsExtractor-style
    * mergeColumnChunks, reference ParquetStatsExtractor.java:63-97).
    */
  def lt(a: String, b: String, dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType | ByteType => a.toLong < b.toLong
    case FloatType | DoubleType => a.toDouble < b.toDouble
    case _: DecimalType => new java.math.BigDecimal(a)
      .compareTo(new java.math.BigDecimal(b)) < 0
    case TimestampType | TimestampNTZType => a.toLong < b.toLong
    case _ => a < b                                      // string/date/binary-hex: lexical
  }
}
