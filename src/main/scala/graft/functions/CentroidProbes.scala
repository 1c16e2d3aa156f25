package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** The `nprobe` nearest IVF cells of a vector, best first, in ONE
  * codegen'd pass: rank cells by (dot(v, c)/|c| DESC, cell ASC); a
  * zero-norm (degenerate) centroid scores -Infinity so it never wins.
  *
  * Same rationale as [[RhpBandKeys]]: the compositional form (an
  * `array_sort` over nCells structs of `VecDot`-vs-literal-array scores)
  * embeds nCells x dims literals into the plan — large enough to fall
  * out of whole-stage codegen and slow to re-optimize; here the
  * centroids live in one referenced `double[][]` and the generated code
  * is a dot loop plus an insertion select of the top `nprobe`.
  *
  * Ranking semantics are identical to the struct-sort form (ties break
  * to the lower cell id; dots accumulate left-to-right over
  * min(|v|, dims) components), so the DuckDB oracles that re-train and
  * re-rank the same centroids in SQL stay hash-identical.
  */
case class CentroidProbes(child: Expression,
    centroids: Array[Array[Double]], norms: Array[Double], nprobe: Int)
    extends UnaryExpression {

  require(nprobe >= 1 && nprobe <= centroids.length,
    s"nprobe $nprobe out of range for ${centroids.length} cells")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "centroid_probes"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val get: Int => Double =
      if (isFloat) i => v.getFloat(i).toDouble else i => v.getDouble(i)
    new GenericArrayData(CentroidProbes.compute(get, v.numElements(),
      centroids, norms, nprobe))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val nRef = ctx.addReferenceObj("norms", norms, "double[]")
      val n      = ctx.freshName("n")
      val scores = ctx.freshName("scores")
      val c      = ctx.freshName("c")
      val d      = ctx.freshName("d")
      val acc    = ctx.freshName("acc")
      val cent   = ctx.freshName("cent")
      val out    = ctx.freshName("out")
      val p      = ctx.freshName("p")
      val best   = ctx.freshName("best")
      val s      = ctx.freshName("s")
      val taken  = ctx.freshName("taken")
      val get    = if (isFloat) s"(double)$v.getFloat($d)" else s"$v.getDouble($d)"
      s"""
         |int $n = $v.numElements();
         |double[] $scores = new double[${centroids.length}];
         |for (int $c = 0; $c < ${centroids.length}; $c++) {
         |  if ($nRef[$c] == 0.0) { $scores[$c] = Double.NEGATIVE_INFINITY; continue; }
         |  double[] $cent = $cRef[$c];
         |  int $s = java.lang.Math.min($n, $cent.length);
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $s; $d++) {
         |    $acc += $get * $cent[$d];
         |  }
         |  $scores[$c] = $acc / $nRef[$c];
         |}
         |int[] $out = new int[${nprobe}];
         |boolean[] $taken = new boolean[${centroids.length}];
         |for (int $p = 0; $p < ${nprobe}; $p++) {
         |  int $best = -1;
         |  for (int $c = 0; $c < ${centroids.length}; $c++) {
         |    if (!$taken[$c] && ($best < 0 || $scores[$c] > $scores[$best])) $best = $c;
         |  }
         |  $taken[$best] = true;
         |  $out[$p] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidProbes =
    copy(child = newChild)
}

object CentroidProbes {

  /** Shared eval-path kernel (also the reference for the generated code).
    * Selection is "first max wins" over remaining cells, which is exactly
    * (score DESC, cell ASC).
    */
  private[functions] def compute(get: Int => Double, len: Int,
      centroids: Array[Array[Double]], norms: Array[Double],
      nprobe: Int): Array[Int] = {
    val scores = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      if (norms(c) == 0.0) scores(c) = Double.NegativeInfinity
      else {
        val cent = centroids(c)
        val n = math.min(len, cent.length)
        var acc = 0.0
        var d = 0
        while (d < n) { acc += get(d) * cent(d); d += 1 }
        scores(c) = acc / norms(c)
      }
      c += 1
    }
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](centroids.length)
    var p = 0
    while (p < nprobe) {
      var best = -1
      var i = 0
      while (i < centroids.length) {
        if (!taken(i) && (best < 0 || scores(i) > scores(best))) best = i
        i += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    out
  }

  def of(vec: Column, centroids: Array[Array[Double]], norms: Array[Double],
      nprobe: Int): Column =
    toColumn(CentroidProbes(toExpression(vec), centroids, norms, nprobe))
}
