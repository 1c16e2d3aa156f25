package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.types.variant.VariantUtil
import org.apache.spark.unsafe.types.VariantVal

/** O(1) variant type tag as an int, read straight from the variant binary
  * header — the tolerant getters branch on this instead of
  * `schema_of_variant`, which builds a DDL *string* per value per branch
  * and dominated the ingest profile (SURVEY §4.3 performance note).
  */
object VariantKindOps {
  // branch tags; stable ints compiled into the generated code
  val NullK = 0; val BoolK = 1; val IntK = 2; val FloatK = 3
  val Dec0K = 4; val DecFracK = 5; val StrK = 6; val ObjK = 7
  val ArrK = 8; val OtherK = 9

  def kind(v: VariantVal): Int = {
    import VariantUtil.Type
    VariantUtil.getType(v.getValue, 0) match {
      case Type.NULL    => NullK
      case Type.BOOLEAN => BoolK
      case Type.LONG    => IntK // all JSON ints up to int64
      case Type.DOUBLE | Type.FLOAT => FloatK
      case Type.DECIMAL =>
        // zero-scale decimals are big integer literals (> int64); any
        // fractional scale means float syntax in the source text
        if (VariantUtil.getDecimalWithOriginalScale(v.getValue, 0)
            .stripTrailingZeros().scale() <= 0) Dec0K
        else DecFracK
      case Type.STRING  => StrK
      case Type.OBJECT  => ObjK
      case Type.ARRAY   => ArrK
      case _            => OtherK
    }
  }
}

case class VariantKind(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "variant_kind"

  override def nullSafeEval(input: Any): Any =
    VariantKindOps.kind(input.asInstanceOf[VariantVal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VariantKindOps.kind($c);")

  override protected def withNewChildInternal(newChild: Expression): VariantKind =
    copy(child = newChild)
}

object VariantKind {
  def of(c: Column): Column = toColumn(VariantKind(toExpression(c)))
}
