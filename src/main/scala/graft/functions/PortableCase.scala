package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lower, regexp_replace, translate}

/** Engine-portable lowercasing. Java/ICU apply the full Unicode lowercase
  * mapping (context-sensitive final sigma `Σ -> ς` U+03C2; dotted `İ ->
  * i + U+0307`), while utf8proc-based engines (DuckDB — the correctness
  * oracle) apply the simple per-codepoint mapping (`Σ -> σ` U+03C3
  * everywhere; `İ -> i`). Those are the ONLY two lowercase divergence
  * classes in SpecialCasing.txt outside locale-specific (lt/tr/az)
  * tailorings.
  *
  * The canonical form is therefore defined as lowercase + FOLD of those
  * two classes (`ς -> σ`, `i+U+0307 -> i` — the Unicode case-folding
  * direction), applied on BOTH sides: here after the JVM/Spark
  * lowercase, and in every oracle's SQL as
  * `replace(replace(lower(...), 'ς', 'σ'), 'i' || chr(775), 'i')`.
  * Folding both sides is what makes PRE-EXISTING `ς` / `i+dot` in
  * already-lowercase text (ordinary Greek prose ends words with ς)
  * canonicalize identically too — folding only the JVM side would fix
  * uppercase input while silently breaking lowercase input. Everything
  * else (NBSP non-splitting, CJK, ß, compatibility ligatures) already
  * agrees. All of it is pinned by UnicodeParitySpec (goldens + a
  * randomized property sweep).
  */
object PortableCase {

  private final val FinalSigma = 'ς'
  private final val Sigma = 'σ'
  private final val IDot = "i̇"

  /** JVM-side simple-mapping lowercase (used by the fused kernels). */
  def simpleLower(s: String): String = {
    val l = s.toLowerCase(java.util.Locale.ROOT)
    if (l.indexOf(FinalSigma) < 0 && l.indexOf('̇') < 0) l
    else l.replace(FinalSigma, Sigma).replace(IDot, "i")
  }

  /** Column-side portable lowercase: `lower` then the same two
    * normalizations (no-ops on ASCII; `translate` is a char map, the
    * two-char `i+U+0307` collapse is one literal regexp).
    */
  def lowerPortable(c: Column): Column =
    regexp_replace(translate(lower(c), FinalSigma.toString, Sigma.toString),
      IDot, "i")

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Strip only ' ' (U+0020) from the edges — Spark `trim` semantics,
    * NOT Java `String.trim` (which also strips \t\n and would silently
    * drop the empty edge tokens the expression chain and the oracle's
    * `string_split` both keep).
    */
  def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** JVM mirror of [[graft.operators.TextAnalysis.canonStr]]:
    * space-trim, portable lowercase, whitespace collapse.
    */
  def canonJvm(s: String): String =
    Ws.matcher(simpleLower(trimSpaces(s))).replaceAll(" ")

  /** JVM mirror of `canonToks` = split(canonJvm, " ") keeping empty edge
    * tokens (split limit -1), exactly like Spark `split` and DuckDB
    * `string_split`.
    */
  def canonToksJvm(s: String): Array[String] = canonJvm(s).split(" ", -1)
}
