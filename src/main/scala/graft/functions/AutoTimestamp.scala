package graft.functions

import java.time._
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder, TextStyle}
import java.time.temporal.{ChronoField, TemporalAccessor, TemporalQueries}
import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-layout timestamp auto-detection (SURVEY F8).
  *
  * The reference tries 27 date layouts in order and caches the first
  * successful layout per field forever; once cached, ONLY that layout is
  * used and a value that doesn't match it becomes the default
  * (`/root/reference/parser/parser.go:31-65,157-202`). This expression
  * replicates that: the layout list below is the same list converted from
  * Go reference-time notation, the per-field cache becomes a per-expression-
  * instance cache (one instance == one projected column == one field), and
  * Go's "fractional seconds are accepted after the seconds element even if
  * the layout doesn't mention them" rule is encoded as an optional
  * nano-fraction in every layout that has seconds.
  *
  * Strings without a zone offset are interpreted in `zone` (the task
  * timezone) and the result is UTC micros, like the reference.
  */
object GoLayouts {

  /** Go reference-time layouts, in the reference's order. */
  val goLayouts: Seq[String] = Seq(
    "2006-01-02T15:04:05Z07:00",
    "2006-01-02T15:04:05Z0700",
    "2006-01-02T15:04:05",
    "2006-01-02 15:04:05Z07:00",
    "2006-01-02 15:04:05Z0700",
    "2006-01-02 15:04:05",
    "Mon Jan _2 15:04:05 2006",
    "Mon Jan _2 15:04:05 MST 2006",
    "Mon Jan 02 15:04:05 -0700 2006",
    "02 Jan 06 15:04 MST",
    "02 Jan 06 15:04 -0700",
    "Monday, 02-Jan-06 15:04:05 MST",
    "Mon, 02 Jan 2006 15:04:05 MST",
    "Mon, 02 Jan 2006 15:04:05 -0700",
    "Mon Jan 02 15:04:05 MST 2006",
    "Mon 02 Jan 2006 03:04:05 PM MST",
    "Jan 02, 2006 15:04:05Z07:00",
    "Jan 02, 2006 15:04:05Z0700",
    "Jan 02, 2006 15:04:05",
    "02/Jan/2006 15:04:05 Z07:00",
    "02/Jan/2006 15:04:05 Z0700",
    "02/Jan/2006 15:04:05",
    "2006-01-02",
    "02/01/2006",
    "02/Jan/2006",
    "Jan 02, 2006",
    "Mon Jan 02, 2006"
  )

  /** Convert one Go layout into a strict Java formatter. */
  private def toFormatter(go: String): DateTimeFormatter = {
    val b = new DateTimeFormatterBuilder()
    var i = 0
    def at(tok: String): Boolean = go.startsWith(tok, i)
    while (i < go.length) {
      if (at("2006")) { b.appendValue(ChronoField.YEAR, 4); i += 4 }
      else if (at("01")) { b.appendValue(ChronoField.MONTH_OF_YEAR, 2); i += 2 }
      else if (at("02")) { b.appendValue(ChronoField.DAY_OF_MONTH, 2); i += 2 }
      else if (at("_2")) { b.padNext(2); b.appendValue(ChronoField.DAY_OF_MONTH); i += 2 }
      else if (at("15")) { b.appendValue(ChronoField.HOUR_OF_DAY, 2); i += 2 }
      else if (at("03")) { b.appendValue(ChronoField.CLOCK_HOUR_OF_AMPM, 2); i += 2 }
      else if (at("04")) { b.appendValue(ChronoField.MINUTE_OF_HOUR, 2); i += 2 }
      else if (at("05")) {
        b.appendValue(ChronoField.SECOND_OF_MINUTE, 2)
        // Go Parse: fraction allowed after seconds even if not in layout
        b.optionalStart().appendFraction(ChronoField.NANO_OF_SECOND, 1, 9, true).optionalEnd()
        i += 2
      }
      else if (at("06")) { b.appendValueReduced(ChronoField.YEAR, 2, 2, 1969); i += 2 }
      else if (at("Monday")) { b.appendText(ChronoField.DAY_OF_WEEK, TextStyle.FULL); i += 6 }
      else if (at("Mon")) { b.appendText(ChronoField.DAY_OF_WEEK, TextStyle.SHORT); i += 3 }
      else if (at("Jan")) { b.appendText(ChronoField.MONTH_OF_YEAR, TextStyle.SHORT); i += 3 }
      else if (at("PM")) { b.appendText(ChronoField.AMPM_OF_DAY, TextStyle.SHORT); i += 2 }
      else if (at("MST")) { b.appendZoneText(TextStyle.SHORT); i += 3 }
      else if (at("Z07:00")) { b.appendOffset("+HH:MM", "Z"); i += 6 }
      else if (at("Z0700")) { b.appendOffset("+HHMM", "Z"); i += 5 }
      else if (at("-0700")) { b.appendOffset("+HHMM", "+0000"); i += 5 }
      else { b.appendLiteral(go.charAt(i)); i += 1 }
    }
    b.toFormatter(Locale.US)
  }

  lazy val formatters: Array[DateTimeFormatter] = goLayouts.map(toFormatter).toArray

  /** Parse with layout `idx`; UTC micros, or null. Offset-less layouts are
    * interpreted in `zone`.
    */
  def parseWith(idx: Int, s: String, zone: ZoneId): java.lang.Long = {
    try {
      val ta: TemporalAccessor = formatters(idx).parse(s)
      val instant =
        if (ta.isSupported(ChronoField.INSTANT_SECONDS)) Instant.from(ta)
        else {
          val date = LocalDate.from(ta)
          val time = {
            val t = ta.query(TemporalQueries.localTime())
            if (t == null) LocalTime.MIDNIGHT else t
          }
          ZonedDateTime.of(date, time, zone).toInstant
        }
      java.lang.Long.valueOf(instant.getEpochSecond * 1000000L + instant.getNano / 1000L)
    } catch { case _: Exception => null }
  }

  /** Try all layouts in order; (micros, matched index) or null. */
  def detect(s: String, zone: ZoneId): (java.lang.Long, Int) = {
    var i = 0
    while (i < formatters.length) {
      val r = parseWith(i, s, zone)
      if (r != null) return (r, i)
      i += 1
    }
    (null, -1)
  }
}

case class AutoTimestamp(child: Expression, zone: String)
    extends UnaryExpression {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "auto_timestamp"

  @transient private lazy val zoneId = ZoneId.of(zone)
  // Reference-parity per-field layout cache: first successful layout wins
  // and is then the only one tried (parser.go:157-189).
  // Stored as layoutIdx+1 with 0 = "unset": a @transient primitive resets
  // to 0 on task deserialization, so 0 MUST mean uncached (a -1 sentinel
  // silently became "layout 0 cached" on executors).
  @transient private var cachedLayoutPlus1: Int = 0

  /** Parse to UTC micros, or null. Called from both interpreted eval and
    * generated code.
    */
  def parseMicros(s: UTF8String): java.lang.Long = {
    val str = s.toString
    if (str.isEmpty) return null
    val cached = cachedLayoutPlus1 - 1
    if (cached >= 0) {
      GoLayouts.parseWith(cached, str, zoneId)
    } else {
      val (micros, idx) = GoLayouts.detect(str, zoneId)
      if (idx >= 0) cachedLayoutPlus1 = idx + 1
      micros
    }
  }

  override def nullSafeEval(input: Any): Any =
    parseMicros(input.asInstanceOf[UTF8String])

  // real codegen (not CodegenFallback): a CodegenFallback expression would
  // evict the WHOLE projection from whole-stage codegen, which costs ~10x
  // on the ingest hot path
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("autoTs", this, classOf[AutoTimestamp].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("micros")
      s"""
         |java.lang.Long $tmp = $ref.parseMicros($c);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AutoTimestamp =
    copy(child = newChild)
}
