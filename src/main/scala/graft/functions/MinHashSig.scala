package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** k-element minhash signature of a shingle array in ONE scan-local
  * pass: per shingle one md5 digest whose little-endian halves are the
  * Broder two-hash base `(h1, h2)` ([[PortableHash]] == DuckDB
  * `md5_number_lower`/`upper`), permutation i's value is the 64-bit
  * wrapped `h1 + i*h2`, the signature is the per-permutation minimum.
  *
  * Replaces the explode + k-min-column hash aggregate: that shape
  * shuffled one row per (doc, shingle) — hundreds per document — and
  * was the dominant cost of the corpus signature stage. Values are
  * bit-identical (wrapped long arithmetic, signed min), so the DuckDB
  * oracle keeps recomputing the same signatures.
  *
  * Returns NULL for an empty (or null) shingle array — the explode
  * form dropped such documents (no rows to aggregate), and callers
  * filter them out the same way.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.MinHashSig.compute($a, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
    code
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val tl = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def leLong(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (d(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Called from both eval and generated code; null for empty arrays. */
  def compute(shingles: ArrayData, k: Int): GenericArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    val md = tl.get()
    var s = 0
    while (s < n) {
      md.reset()
      val d = md.digest(shingles.getUTF8String(s).getBytes)
      val h1 = leLong(d, 8)
      val h2 = leLong(d, 0)
      var acc = h1
      var i = 0
      while (i < k) {
        if (acc < mins(i)) mins(i) = acc
        acc += h2 // 64-bit wrap == h1 + i*h2 mod 2^64
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  def of(shingles: Column, k: Int): Column =
    toColumn(MinHashSig(toExpression(shingles), k))
}
