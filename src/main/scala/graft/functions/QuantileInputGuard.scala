package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Resolution-time input gate for `graft_quantile_sketch`: the DECIMAL/
  * integer check must not run inside the function BUILDER, because the
  * analyzer may legitimately invoke a builder before the child resolves
  * (nested views, lateral column aliases, subqueries — ResolveFunctions
  * iterates to fixpoint). A builder-time `child.dataType` there either
  * throws on a plan that WOULD resolve next iteration, or silently skips
  * the guard. Instead the builder always wraps the input in this
  * pass-through expression and the check runs in `checkInputDataTypes`,
  * which the analyzer guarantees to evaluate post-resolution — loud on
  * genuinely bad input, deferred (never skipped) on early invocation.
  *
  * The rule itself mirrors `ApproxAgg.quantileHistogram`'s guard: float
  * input truncates toward zero in Spark but rounds half-up in DuckDB, and
  * a DECIMAL whose 10^s does not divide `scale` drops digits — both
  * silently drift from any replayed oracle. Evaluation is pure
  * pass-through (identity eval/codegen, like [[Once]]).
  */
final case class QuantileSketchInputGuard(child: Expression, scale: Int)
    extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "quantile_sketch_input"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case d: DecimalType =>
      val pow = math.pow(10, d.scale).toLong
      if (scale <= 0 || scale % pow != 0)
        TypeCheckResult.TypeCheckFailure(
          s"graft_quantile_sketch scale=$scale cannot exactly represent " +
            s"DECIMAL(${d.precision},${d.scale}) input: scale must be a " +
            s"multiple of 10^${d.scale}")
      else TypeCheckResult.TypeCheckSuccess
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_quantile_sketch needs DECIMAL or integer input for exact " +
          s"scaling (got ${other.simpleString}): Spark's cast truncates " +
          s"while DuckDB rounds, so float input silently drifts from the " +
          s"oracle — cast to DECIMAL first")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(
      newChild: Expression): QuantileSketchInputGuard = copy(child = newChild)
}
