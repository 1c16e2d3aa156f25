package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Numeric HTML character references (`&#233;` / `&#xE9;` / `&#X41;`) for
  * crawl cleanup. Crawl HTML is full of numeric entities; leaving them as
  * literal text pollutes fingerprints/shingles of otherwise identical
  * documents.
  *
  * Semantics (mirrored verbatim by the DuckDB oracle, which runs the
  * equivalent as two bounded regex passes + a chr() map):
  *   - decimal form `&#N;` with 1–7 digits, hex form `&#xN;`/`&#XN;` with
  *     1–6 hex digits;
  *   - decoded only when the value is a valid Unicode scalar in
  *     [1, 0x10FFFF] and not a surrogate (0xD800–0xDFFF) — anything else
  *     (overflow-length, empty payload, missing `;`, out of range) is left
  *     byte-for-byte as written;
  *   - supplementary codepoints (e.g. `&#128512;`) emit the surrogate
  *     pair, matching chr() in the oracle.
  */
object HtmlEntities {

  private def digitVal(hex: Boolean, c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
    else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  def decodeNumeric(s: String): String = {
    if (s.indexOf("&#") < 0) return s
    val n  = s.length
    val sb = new java.lang.StringBuilder(n)
    var i  = 0
    while (i < n) {
      val c = s.charAt(i)
      var literal = true
      if (c == '&' && i + 2 < n && s.charAt(i + 1) == '#') {
        var j   = i + 2
        val hex = s.charAt(j) == 'x' || s.charAt(j) == 'X'
        if (hex) j += 1
        val start  = j
        val maxLen = if (hex) 6 else 7
        var v      = 0
        var ok     = true
        while (j < n && ok && digitVal(hex, s.charAt(j)) >= 0) {
          if (j - start >= maxLen) ok = false
          else { v = v * (if (hex) 16 else 10) + digitVal(hex, s.charAt(j)); j += 1 }
        }
        if (ok && j > start && j < n && s.charAt(j) == ';' &&
            v >= 1 && v <= 0x10FFFF && (v < 0xD800 || v > 0xDFFF)) {
          sb.appendCodePoint(v)
          i = j + 1
          literal = false
        }
      }
      // no entity here: emit ONE char and rescan from i+1 (regex-parity:
      // a failed match at i never swallows a later '&')
      if (literal) { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** UTF8String adapter, called from both interpreted eval and codegen. */
  def decodeNumericUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(decodeNumeric(s.toString))
}

case class DecodeNumericEntities(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "decode_numeric_entities"

  override def nullSafeEval(input: Any): Any =
    HtmlEntities.decodeNumericUtf8(input.asInstanceOf[UTF8String])

  // real codegen (not CodegenFallback) so the surrounding projection stays
  // inside whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlEntities.decodeNumericUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): DecodeNumericEntities =
    copy(child = newChild)
}
