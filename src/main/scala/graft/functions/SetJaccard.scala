package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Set Jaccard similarity of two `array<string>` columns in ONE pass:
  * `|A ∩ B| / |A ∪ B|` with set (distinct-element) semantics, 0.0 for
  * an empty union — exactly `size(array_intersect(a,b)) /
  * size(array_union(a,b))` with the null-free inputs the dedup
  * operators produce, but with a single hash build per pair instead of
  * two: `array_intersect` and `array_union` each build their own set,
  * and on near-dup verify stages running millions of candidate pairs
  * over multi-hundred-element shingle arrays that doubles the dominant
  * cost.
  */
case class SetJaccard(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "set_jaccard"

  override def nullSafeEval(l: Any, r: Any): Any =
    SetJaccard.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("setJaccard", SetJaccard, "graft.functions.SetJaccard$")
      s"${ev.value} = $ref.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SetJaccard = copy(left = newLeft, right = newRight)
}

object SetJaccard {

  /** Called from both eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String](math.max(8, a.numElements() * 2))
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val seenB = new java.util.HashSet[UTF8String](math.max(8, b.numElements() * 2))
    var inter = 0
    var j = 0
    while (j < b.numElements()) {
      val e = b.getUTF8String(j)
      if (seenB.add(e) && setA.contains(e)) inter += 1
      j += 1
    }
    val union = setA.size() + seenB.size() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def of(a: Column, b: Column): Column = toColumn(SetJaccard(toExpression(a), toExpression(b)))
}

/** [[SetJaccard]] over `array<bigint>` — the fingerprint form the
  * minhash verify stage moves at scale: the exchanges carry 8-byte
  * hashes instead of ~25-byte shingle strings (~3x less verify shuffle
  * at 10M docs, BENCHNOTES r17) and the pair kernel runs a sorted
  * merge over two primitive arrays instead of hashing UTF8 strings
  * into sets — no boxing, no per-element string compare. Distinct
  * (set) semantics match the string form exactly; dup values inside an
  * input (a 64-bit collision between two shingles of one document)
  * count once, same as a duplicated string would.
  */
case class SetJaccardLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "set_jaccard_long"

  override def nullSafeEval(l: Any, r: Any): Any =
    SetJaccardLong.compute(l.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("setJaccardLong", SetJaccardLong,
        "graft.functions.SetJaccardLong$")
      s"${ev.value} = $ref.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SetJaccardLong = copy(left = newLeft, right = newRight)
}

object SetJaccardLong {

  /** Called from both eval and generated code: sort both primitive
    * arrays, merge-count distinct intersection/union.
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    java.util.Arrays.sort(x)
    java.util.Arrays.sort(y)
    var i = 0; var j = 0; var inter = 0; var union = 0
    while (i < x.length || j < y.length) {
      if (j >= y.length || (i < x.length && x(i) < y(j))) {
        val v = x(i); union += 1
        while (i < x.length && x(i) == v) i += 1
      } else if (i >= x.length || y(j) < x(i)) {
        val v = y(j); union += 1
        while (j < y.length && y(j) == v) j += 1
      } else {
        val v = x(i); union += 1; inter += 1
        while (i < x.length && x(i) == v) i += 1
        while (j < y.length && y(j) == v) j += 1
      }
    }
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def of(a: Column, b: Column): Column =
    toColumn(SetJaccardLong(toExpression(a), toExpression(b)))
}
