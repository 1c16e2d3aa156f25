package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd scalar — the standard
  * pre-dedup canonicalization (crawled text mixes composed `é` with
  * decomposed `e`+U+0301; fingerprints and shingles must not see them
  * as different documents). Spark has no built-in for it; a Scala UDF
  * would fall out of whole-stage codegen, so this is a native
  * expression calling `java.text.Normalizer` (UAX #15 — the same
  * algorithm utf8proc implements, so DuckDB's `nfc_normalize` is the
  * oracle twin).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * nearly every real-world string is already NFC — the quick check
  * skips the transform and the UTF8String re-encode entirely.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Called from both eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def of(c: Column): Column = toColumn(NfcNormalize(toExpression(c)))
}

/** NFKC — the tokenizer-preprocessing sibling of [[NfcNormalize]]:
  * compatibility decomposition additionally folds ligatures (`ﬁ` →
  * `fi`), fullwidth forms (`Ａ` → `A`) and super/subscripts before
  * recomposition, which is what BERT-style normalizers apply ahead of
  * tokenization. Unit-only BY DESIGN: the oracle engine has no NFKC
  * function (utf8proc exposes only `nfc_normalize` through DuckDB), so
  * parity is pinned by JVM-side known-answer tests instead.
  */
case class NfkcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfkc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfkcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfkcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}

object NfkcNormalize {

  /** Called from both eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC))
  }

  def of(c: Column): Column = toColumn(NfkcNormalize(toExpression(c)))
}
