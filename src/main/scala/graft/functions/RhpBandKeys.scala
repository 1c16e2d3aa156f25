package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH band keys of a vector, in ONE codegen'd pass:
  * `nBits` hyperplane dot products (planes = deterministic splitmix64
  * literals, see [[RhpBandKeys.planeComponent]]) -> sign bits -> packed
  * `nBits/bandBits` band keys (`array<long>`, or `array<int>` under
  * `intKeys` — only legal at bandBits <= 32, where the int values are
  * exactly the truncated longs, so equality joins decide identically
  * on half the bytes; the narrowing lives HERE, inside the codegen'd
  * kernel, because wrapping the long form in a `transform(_.cast(int))`
  * HOF knocked the whole projection out of whole-stage codegen and its
  * subexpression elimination — the generator null-guard filter then
  * re-evaluated the full kernel 3x per row, measured 6x wall on the
  * 2M-vector row, r19).
  *
  * The expression exists for scale: composing the same thing from
  * per-bit `VecDot`-vs-literal-array columns + higher-order `aggregate`
  * packing builds a 10K+-literal expression tree that falls out of
  * whole-stage codegen and runs interpreted — measured ~5x slower at 192
  * bits over a 4K corpus, and worse the wider the corpus row. Here the
  * planes live in ONE referenced `double[][]` and the generated code is
  * two tight loops.
  *
  * Bit/packing semantics are identical to the compositional form, so
  * DuckDB oracles keep recomputing the keys from the same plane
  * literals: bit b = (dot(v, plane_b) >= 0), key_k = fold(acc*2+bit)
  * over the band's bits, dots accumulated left-to-right over
  * min(|v|, dims) components.
  */
case class RhpBandKeys(child: Expression, dims: Int, nBits: Int, bandBits: Int,
    intKeys: Boolean = false)
    extends UnaryExpression {

  require(nBits % bandBits == 0, s"nBits $nBits must be a multiple of bandBits $bandBits")
  // int keys only when every band key provably fits 32 bits; wrap-around
  // int arithmetic is then congruent mod 2^32 to the long fold, i.e. the
  // emitted values are exactly (int) of the long keys — an injective
  // narrowing, so every downstream equality decides identically
  require(!intKeys || bandBits <= 32,
    s"intKeys requires bandBits <= 32 (got $bandBits)")

  override def dataType: DataType =
    ArrayType(if (intKeys) IntegerType else LongType, containsNull = false)
  override def prettyName: String = "rhp_band_keys"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nBits, dims)((b, d) => RhpBandKeys.planeComponent(b, d))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val keys = RhpBandKeys.compute(
      i => if (isFloat) v.getFloat(i).toDouble else v.getDouble(i),
      v.numElements(), planes, nBits, bandBits)
    new GenericArrayData(if (intKeys) keys.map(_.toInt) else keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val n     = ctx.freshName("n")
      val keys  = ctx.freshName("keys")
      val b     = ctx.freshName("b")
      val d     = ctx.freshName("d")
      val acc   = ctx.freshName("acc")
      val plane = ctx.freshName("plane")
      val get   = if (isFloat) s"(double)$v.getFloat($d)" else s"$v.getDouble($d)"
      val (elemT, one, zero) =
        if (intKeys) ("int", "1", "0") else ("long", "1L", "0L")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), ${dims});
         |$elemT[] $keys = new $elemT[${nBits / bandBits}];
         |for (int $b = 0; $b < ${nBits}; $b++) {
         |  double[] $plane = $planesRef[$b];
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += $get * $plane[$d];
         |  }
         |  $keys[$b / ${bandBits}] = $keys[$b / ${bandBits}] * 2 + ($acc >= 0 ? $one : $zero);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RhpBandKeys =
    copy(child = newChild)
}

object RhpBandKeys {

  /** Deterministic pseudo-random hyperplane component for (seed, dim):
    * splitmix64 of the pair scaled to [-1, 1]. Plan-time constants — the
    * DuckDB oracles embed the identical doubles.
    */
  def planeComponent(seed: Int, dim: Int): Double = {
    val h = {
      var z = seed.toLong * 0x9E3779B97F4A7C15L + dim.toLong
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    h.toDouble / Long.MaxValue.toDouble
  }

  /** Shared eval-path kernel (also the reference for the generated code). */
  private[functions] def compute(get: Int => Double, len: Int,
      planes: Array[Array[Double]], nBits: Int, bandBits: Int): Array[Long] = {
    val n = math.min(len, planes(0).length)
    val keys = new Array[Long](nBits / bandBits)
    var b = 0
    while (b < nBits) {
      val plane = planes(b)
      var acc = 0.0
      var d = 0
      while (d < n) { acc += get(d) * plane(d); d += 1 }
      keys(b / bandBits) = keys(b / bandBits) * 2L + (if (acc >= 0) 1L else 0L)
      b += 1
    }
    keys
  }

  def of(vec: Column, dims: Int, nBits: Int, bandBits: Int,
      intKeys: Boolean = false): Column =
    toColumn(RhpBandKeys(toExpression(vec), dims, nBits, bandBits, intKeys))
}
