package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass literal-word hit counting over a document — the fused
  * kernel behind stopword scoring and language ID.
  *
  * The compositional form ([[graft.operators.TextAnalysis.wordHits]] —
  * the replace-length trick) materializes one padded copy of the text
  * AND one replace() pass PER WORD: quality scoring (8 stopwords) plus
  * language ID (5 languages x 5 markers) cost ~33 full string passes per
  * document, the dominant term of the curation sweep. Here the text pads
  * (and for langId lowercases) ONCE and each word is a bare indexOf
  * scan — no regex, no copies. Hit semantics are identical (leftmost
  * non-overlapping occurrences of " word " in the padded text; pinned by
  * FusedParitySpec against the compositional form), so the DuckDB
  * oracles keep recomputing identical counts.
  */
object WordHits {

  /** Leftmost non-overlapping occurrences of `" word "` in `padded` —
    * exactly the count the replace-length trick yields.
    */
  def countIn(padded: String, word: String): Long = {
    val needle = " " + word + " "
    var n = 0L
    var i = padded.indexOf(needle)
    while (i >= 0) { n += 1; i = padded.indexOf(needle, i + needle.length) }
    n
  }

  /** Sum of per-word hits over one padded copy of the text. */
  def total(text: UTF8String, words: Array[String]): Long = {
    val padded = " " + text.toString + " "
    var s = 0L
    var i = 0
    while (i < words.length) { s += countIn(padded, words(i)); i += 1 }
    s
  }

  /** Argmax language by marker-word hits over ONE lowercased padded
    * copy: first language (in the given order) with the strictly
    * greatest score wins; zero hits everywhere -> "und". Lowercasing via
    * [[PortableCase.simpleLower]] keeps parity with the DuckDB oracle's
    * `lower()` on the Unicode divergence classes.
    */
  def bestLang(text: UTF8String, langs: Array[String],
      markers: Array[Array[String]]): UTF8String = {
    val padded = " " + PortableCase.simpleLower(text.toString) + " "
    var best = 0L
    var bestLang = "und"
    var i = 0
    while (i < langs.length) {
      var s = 0L
      val ws = markers(i)
      var j = 0
      while (j < ws.length) { s += countIn(padded, ws(j)); j += 1 }
      if (s > best) { best = s; bestLang = langs(i) }
      i += 1
    }
    UTF8String.fromString(bestLang)
  }

  def totalOf(text: Column, words: Seq[String]): Column =
    toColumn(WordHitsTotal(toExpression(text), words))

  def langIdOf(text: Column, markers: Seq[(String, Seq[String])]): Column =
    toColumn(LangIdBest(toExpression(text), markers))
}

/** Sum of literal-word hit counts — fused form of `stopwordHits`. */
case class WordHitsTotal(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "word_hits_total"

  private lazy val wordArr: Array[String] = words.toArray

  override def nullSafeEval(input: Any): Any =
    WordHits.total(input.asInstanceOf[UTF8String], wordArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val w = ctx.addReferenceObj("words", wordArr, "java.lang.String[]")
      s"${ev.value} = graft.functions.WordHits.total($c, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordHitsTotal =
    copy(child = newChild)
}

/** Argmax language over marker-word hit counts — fused form of
  * `langId` (one lowercase + one padded copy per document).
  */
case class LangIdBest(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id_best"

  private lazy val langArr: Array[String] = markers.map(_._1).toArray
  private lazy val markerArr: Array[Array[String]] =
    markers.map(_._2.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    WordHits.bestLang(input.asInstanceOf[UTF8String], langArr, markerArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val l = ctx.addReferenceObj("langs", langArr, "java.lang.String[]")
      val m = ctx.addReferenceObj("markers", markerArr, "java.lang.String[][]")
      s"${ev.value} = graft.functions.WordHits.bestLang($c, $l, $m);"
    })

  override protected def withNewChildInternal(newChild: Expression): LangIdBest =
    copy(child = newChild)
}
