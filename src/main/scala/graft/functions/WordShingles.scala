package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of the canonical (lowercased,
  * whitespace-collapsed) text, as one codegen'd expression.
  *
  * Replaces the split + sequence + transform + array_distinct chain, whose
  * higher-order lambdas run interpreted and made shingling the minhash
  * bottleneck (it executes once for the signature and once per verify
  * side). Semantics match the expression chain exactly: texts shorter than
  * n words yield the single joined text.
  */
object WordShinglesOps {
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = PortableCase.canonToksJvm(text.toString)
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length < n) {
      out.add(toks.mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShinglesOps.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShinglesOps.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def of(c: Column, n: Int): Column = toColumn(WordShingles(toExpression(c), n))
}
