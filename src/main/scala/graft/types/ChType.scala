package graft.types

import org.apache.spark.sql.types._

/** ClickHouse column-type model, re-expressed for Spark.
  *
  * Mirrors the reference's type enum and `WhichType` parser
  * (`/root/reference/model/value.go:27-56,161-238`): a ClickHouse type
  * string (as returned by `system.columns`) is parsed into a [[ChTypeInfo]]
  * and mapped onto a Spark [[DataType]] per the SURVEY §1.3 table.
  *
  * Unsigned handling: Spark has no unsigned integers, so each UIntN widens
  * one level; UInt64 becomes Decimal(20,0) so the full range survives.
  */
sealed abstract class ChKind(val chName: String)
object ChKind {
  case object Bool     extends ChKind("Bool")
  case object Int8     extends ChKind("Int8")
  case object Int16    extends ChKind("Int16")
  case object Int32    extends ChKind("Int32")
  case object Int64    extends ChKind("Int64")
  case object UInt8    extends ChKind("UInt8")
  case object UInt16   extends ChKind("UInt16")
  case object UInt32   extends ChKind("UInt32")
  case object UInt64   extends ChKind("UInt64")
  case object Float32  extends ChKind("Float32")
  case object Float64  extends ChKind("Float64")
  case object Decimal  extends ChKind("Decimal")
  case object DateTime extends ChKind("DateTime")
  case object Str      extends ChKind("String")
  case object Obj      extends ChKind("Object('json')")
  case object MapK     extends ChKind("Map")
  case object IPv4     extends ChKind("IPv4")
  case object IPv6     extends ChKind("IPv6")

  val scalars: Seq[ChKind] = Seq(Bool, Int8, Int16, Int32, Int64, UInt8,
    UInt16, UInt32, UInt64, Float32, Float64, DateTime, Str, Obj, IPv4, IPv6)
}

final case class ChTypeInfo(
    kind: ChKind,
    nullable: Boolean = false,
    array: Boolean = false,
    mapKey: Option[ChTypeInfo] = None,
    mapValue: Option[ChTypeInfo] = None,
    dateTime64Precision: Int = 0) {

  /** Spark type for one scalar cell of this CH type (ignoring array). */
  def elementSparkType: DataType = kind match {
    case ChKind.Bool     => BooleanType
    case ChKind.Int8     => ByteType
    case ChKind.Int16    => ShortType
    case ChKind.Int32    => IntegerType
    case ChKind.Int64    => LongType
    case ChKind.UInt8    => ShortType
    case ChKind.UInt16   => IntegerType
    case ChKind.UInt32   => LongType
    case ChKind.UInt64   => DecimalType(20, 0)
    case ChKind.Float32  => FloatType
    case ChKind.Float64  => DoubleType
    case ChKind.Decimal  => DecimalType(38, 9)
    case ChKind.DateTime => TimestampType
    case ChKind.Str      => StringType
    case ChKind.Obj      => MapType(StringType, StringType)
    case ChKind.IPv4     => StringType
    case ChKind.IPv6     => StringType
    case ChKind.MapK =>
      MapType(
        mapKey.map(_.elementSparkType).getOrElse(StringType),
        mapValue.map(_.elementSparkType).getOrElse(StringType))
  }

  def sparkType: DataType =
    if (array) ArrayType(elementSparkType, containsNull = false)
    else elementSparkType

  def field(name: String): StructField =
    StructField(name, sparkType, nullable = nullable || !array)
}

object ChType {

  private val lowCardinality = """^LowCardinality\((.+)\)$""".r
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, ChTypeInfo]()

  private val baseKinds: Map[String, ChKind] =
    ChKind.scalars.map(k => k.chName -> k).toMap ++
      Map("UUID" -> ChKind.Str, "Date" -> ChKind.DateTime, "Date32" -> ChKind.DateTime)

  /** Parse a ClickHouse type name. Unknown types raise (the reference treats
    * them as fatal, `model/value.go:215`).
    */
  def whichType(typRaw: String): ChTypeInfo = {
    val stripped = typRaw match {
      case lowCardinality(inner) => inner
      case other                 => other
    }
    // no computeIfAbsent: parse recurses for Map(K, V) inner types
    val hit = cache.get(stripped)
    if (hit != null) hit
    else {
      val parsed = parse(stripped)
      cache.putIfAbsent(stripped, parsed)
      parsed
    }
  }

  private def parse(typ0: String): ChTypeInfo = {
    val nullable = typ0.startsWith("Nullable(")
    val array    = typ0.startsWith("Array(")
    val typ =
      if (nullable) typ0.substring("Nullable(".length, typ0.length - 1)
      else if (array) typ0.substring("Array(".length, typ0.length - 1)
      else typ0
    val inner = typ match {
      case lowCardinality(i) => i
      case other             => other
    }

    def mk(kind: ChKind, prec: Int = 0) =
      ChTypeInfo(kind, nullable = nullable, array = array, dateTime64Precision = prec)

    baseKinds.get(inner) match {
      case Some(k) => mk(k)
      case None =>
        if (inner.startsWith("DateTime64")) {
          val prec = {
            val i = inner.indexOf('(')
            if (i < 0) 3
            else {
              val j = inner.indexOf(')', i)
              val p = inner.substring(i + 1, j).split(',')(0).trim
              scala.util.Try(p.toInt).toOption.filter(x => x >= 0 && x <= 9).getOrElse(0)
            }
          }
          mk(ChKind.DateTime, prec)
        } else if (inner.startsWith("DateTime")) mk(ChKind.DateTime)
        else if (inner.startsWith("Decimal")) mk(ChKind.Decimal)
        else if (inner.startsWith("FixedString")) mk(ChKind.Str)
        else if (inner.startsWith("Enum8(") || inner.startsWith("Enum16(")) mk(ChKind.Str)
        else if (inner.startsWith("Map(")) {
          val body = inner.substring("Map(".length, inner.length - 1)
          val idx  = body.indexOf(", ")
          require(idx > 0, s"malformed Map type: $typ0")
          ChTypeInfo(
            ChKind.MapK,
            nullable = nullable,
            array = array,
            mapKey = Some(whichType(body.substring(0, idx))),
            mapValue = Some(whichType(body.substring(idx + 2))))
        } else
          throw new IllegalArgumentException(
            s"ClickHouse column type $typ0 is not a supported type (case-sensitive)")
    }
  }

  /** CH `system.columns` rows -> Spark schema (SURVEY §2.1 S11). */
  def toStructType(cols: Seq[(String, String)]): StructType =
    StructType(cols.map { case (name, typ) => whichType(typ).field(name) })
}
