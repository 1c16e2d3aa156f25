package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toExpression}
import org.apache.spark.sql.types.DataType

/** Identity wrapper marked non-deterministic: an optimizer barrier that
  * guarantees its child is computed ONCE per row.
  *
  * Why: the corrupt-message filter (`parse_json(value) IS NOT NULL`) gets
  * predicate-pushed through the projection, duplicating the parse at the
  * scan — the single most expensive expression of the ingest path would
  * run twice per row. Marking the bound column non-deterministic makes
  * both PushPredicateThroughNonJoin and CollapseProject keep their hands
  * off, which is exactly the "evaluate once" contract we want. Evaluation
  * semantics are untouched (pure pass-through eval/codegen).
  */
case class Once(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "once"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Once =
    copy(child = newChild)
}

object Once {
  def apply(c: Column): Column = toColumn(Once(toExpression(c)))
}
