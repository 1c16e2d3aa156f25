package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IpUtil
import graft.types.{ChKind, ChType}

/** WhichType parity tests (reference `/root/reference/model/value.go:161-238`). */
class ChTypeSpec extends AnyFunSuite {

  test("scalar types") {
    assert(ChType.whichType("Int32").sparkType === IntegerType)
    assert(ChType.whichType("UInt64").sparkType === DecimalType(20, 0))
    assert(ChType.whichType("Float32").sparkType === FloatType)
    assert(ChType.whichType("String").sparkType === StringType)
    assert(ChType.whichType("Bool").sparkType === BooleanType)
    assert(ChType.whichType("UUID").kind === ChKind.Str)
    assert(ChType.whichType("Date").kind === ChKind.DateTime)
    assert(ChType.whichType("Enum8('a'=1,'b'=2)").kind === ChKind.Str)
    assert(ChType.whichType("FixedString(16)").kind === ChKind.Str)
    assert(ChType.whichType("Decimal(18,3)").kind === ChKind.Decimal)
  }

  test("wrappers") {
    val n = ChType.whichType("Nullable(Int64)")
    assert(n.nullable && n.sparkType === LongType)
    val a = ChType.whichType("Array(UInt8)")
    assert(a.array && a.sparkType === ArrayType(ShortType, containsNull = false))
    assert(ChType.whichType("LowCardinality(String)").kind === ChKind.Str)
    assert(ChType.whichType("Nullable(LowCardinality(String))").nullable)
  }

  test("datetime precision") {
    assert(ChType.whichType("DateTime").dateTime64Precision === 0)
    assert(ChType.whichType("DateTime64(3)").dateTime64Precision === 3)
    assert(ChType.whichType("DateTime64(9)").dateTime64Precision === 9)
    assert(ChType.whichType("Nullable(DateTime64(6))").dateTime64Precision === 6)
    assert(ChType.whichType("DateTime('UTC')").kind === ChKind.DateTime)
  }

  test("maps, recursive") {
    val m = ChType.whichType("Map(String, Map(String, UInt32))")
    assert(m.kind === ChKind.MapK)
    assert(m.mapValue.get.kind === ChKind.MapK)
    assert(m.sparkType === MapType(StringType, MapType(StringType, LongType)))
  }

  test("unknown type is fatal") {
    intercept[IllegalArgumentException](ChType.whichType("Tuple(Int32, Int32)"))
  }

  test("system.columns rows to StructType") {
    val st = ChType.toStructType(Seq(
      "time" -> "DateTime", "name" -> "String", "value" -> "Float32",
      "tags" -> "Nullable(String)"))
    assert(st.fieldNames.toSeq === Seq("time", "name", "value", "tags"))
    assert(st("tags").nullable)
  }
}

/** Go net.ParseIP-parity checks for the validator behind F9. */
class IpUtilSpec extends AnyFunSuite {
  test("ipv4") {
    assert(IpUtil.isValidIp("0.0.0.0"))
    assert(IpUtil.isValidIp("255.255.255.255"))
    assert(!IpUtil.isValidIp("256.1.1.1"))
    assert(!IpUtil.isValidIp("1.2.3"))
    assert(!IpUtil.isValidIp("1.2.3.4.5"))
    assert(!IpUtil.isValidIp("01.2.3.4")) // leading zero (Go 1.17+)
    assert(!IpUtil.isValidIp("1.2.3.a"))
    assert(!IpUtil.isValidIp(""))
  }
  test("ipv6") {
    assert(IpUtil.isValidIp("::"))
    assert(IpUtil.isValidIp("::1"))
    assert(IpUtil.isValidIp("2001:db8::1"))
    assert(IpUtil.isValidIp("2001:0db8:85a3:0000:0000:8a2e:0370:7334"))
    assert(IpUtil.isValidIp("::ffff:192.168.1.1"))
    assert(IpUtil.isValidIp("fe80::1%eth0")) // zone index
    assert(!IpUtil.isValidIp("2001:db8::1::2")) // two "::"
    assert(!IpUtil.isValidIp("2001:db8:85a3:0:0:8a2e:370:7334:1234")) // 9 groups
    assert(!IpUtil.isValidIp("g::1"))
    assert(!IpUtil.isValidIp(":"))
  }
}
