package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit simhash of a document in ONE scan-local pass: canonical
  * whitespace-normalized lowercase tokens -> md5-lower hash per token
  * ([[PortableHash.lo]] == DuckDB `md5_number_lower`) -> per-bit sign
  * counters -> signature long.
  *
  * Replaces the explode + 64-conditional-sum hash aggregate
  * (token-explode shuffled ~200 rows per document and the aggregate
  * re-extracted the hash 64 times per token); here the signature
  * computes where the document is scanned — no explode, no shuffle, one
  * counter loop per token. Token and bit semantics are identical to the
  * compositional form (pinned by a parity test), so the DuckDB oracle
  * keeps recomputing identical signatures.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Called from both eval and generated code. Tokenization mirrors
    * `split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")`
    * exactly — including the quirk that an empty canonical text yields
    * ONE empty token (md5("") participates), which the oracle's
    * `string_split` reproduces.
    */
  def compute(text: UTF8String): Long = {
    val canonical =
      Ws.matcher(PortableCase.simpleLower(text.trim().toString)).replaceAll(" ")
    val counters = new Array[Int](64)
    var start = 0
    var done = false
    while (!done) {
      val sp = canonical.indexOf(' ', start)
      val tok = if (sp < 0) canonical.substring(start) else canonical.substring(start, sp)
      val h = PortableHash.lo(UTF8String.fromString(tok))
      var j = 0
      while (j < 64) {
        counters(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      if (sp < 0) done = true else start = sp + 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counters(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def of(text: Column): Column = toColumn(SimHash64(toExpression(text)))
}
