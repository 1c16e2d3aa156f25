package graft

import java.time.ZoneId

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GoLayouts

/** Layout-detection coverage for the 27 Go layouts (SURVEY F8,
  * reference `/root/reference/parser/parser.go:31-65`).
  */
class AutoTimestampSpec extends AnyFunSuite {

  private val utc = ZoneId.of("UTC")
  private val sh  = ZoneId.of("Asia/Shanghai")

  private def det(s: String, z: ZoneId = utc): (Long, Int) = {
    val (micros, idx) = GoLayouts.detect(s, z)
    assert(micros != null, s"no layout matched: $s")
    (micros.longValue(), idx)
  }

  private def iso(s: String): Long = {
    val i = java.time.Instant.parse(s)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  test("rfc3339 family") {
    assert(det("2009-07-13T09:07:13Z")._1 === iso("2009-07-13T09:07:13Z"))
    assert(det("2009-07-13T09:07:13+08:00")._1 === iso("2009-07-13T01:07:13Z"))
    assert(det("2009-07-13T09:07:13.123+08:00")._1 === iso("2009-07-13T01:07:13.123Z"))
    assert(det("2009-07-13T09:07:13+0800")._1 === iso("2009-07-13T01:07:13Z"))
    assert(det("2009-07-13T09:07:13")._1 === iso("2009-07-13T09:07:13Z"))
  }

  test("iso8601 space family with task timezone") {
    assert(det("2009-07-13 09:07:13+08:00")._1 === iso("2009-07-13T01:07:13Z"))
    assert(det("2009-07-13 09:07:13")._1 === iso("2009-07-13T09:07:13Z"))
    assert(det("2009-07-13 09:07:13.123")._1 === iso("2009-07-13T09:07:13.123Z"))
    // offset-less string in Shanghai tz -> shifted to UTC
    assert(det("2009-07-13 09:07:13", sh)._1 === iso("2009-07-13T01:07:13Z"))
  }

  test("golang/date-command layouts") {
    assert(det("Mon Jul 13 09:07:13 2009")._1 === iso("2009-07-13T09:07:13Z")) // ANSIC
    assert(det("Mon Jul  6 09:07:13 2009")._1 === iso("2009-07-06T09:07:13Z")) // _2 pad
    assert(det("Mon Jul 13 09:07:13 -0700 2009")._1 === iso("2009-07-13T16:07:13Z")) // RubyDate
    assert(det("13 Jul 09 09:07 -0700")._1 === iso("2009-07-13T16:07:00Z")) // RFC822Z
    assert(det("Mon, 13 Jul 2009 09:07:13 -0700")._1 === iso("2009-07-13T16:07:13Z")) // RFC1123Z
  }

  test("home-brewed layouts") {
    assert(det("Jul 13, 2009 09:07:13")._1 === iso("2009-07-13T09:07:13Z"))
    assert(det("13/Jul/2009 09:07:13 +0800")._1 === iso("2009-07-13T01:07:13Z"))
    assert(det("13/Jul/2009 09:07:13")._1 === iso("2009-07-13T09:07:13Z"))
  }

  test("date-only layouts") {
    assert(det("2009-07-13")._1 === iso("2009-07-13T00:00:00Z"))
    assert(det("13/07/2009")._1 === iso("2009-07-13T00:00:00Z"))
    assert(det("13/Jul/2009")._1 === iso("2009-07-13T00:00:00Z"))
    assert(det("Jul 13, 2009")._1 === iso("2009-07-13T00:00:00Z"))
    // date-only in task timezone
    assert(det("2009-07-13", sh)._1 === iso("2009-07-12T16:00:00Z"))
  }

  test("first matching layout wins, deterministically") {
    // "13/07/2009" matches 02/01/2006 (idx 23) and not 02/Jan/2006
    assert(det("13/07/2009")._2 === 23)
    // full datetime prefers the offset layout over date-only prefixes
    assert(det("2009-07-13T09:07:13Z")._2 === 0)
  }

  test("non-dates do not match") {
    assert(GoLayouts.detect("escaped_\"ws", utc)._2 === -1)
    assert(GoLayouts.detect("123", utc)._2 === -1)
    assert(GoLayouts.detect("", utc)._2 === -1)
  }
}
