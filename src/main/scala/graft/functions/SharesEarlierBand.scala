package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** True when two band-key arrays (`array<long>` or `array<int>` — both
  * sides the same width) agree on ANY band strictly before `band` — the
  * first-matching-band dedup predicate for LSH candidate joins: a pair
  * that already matched in an earlier band is dropped here, so each
  * candidate pair survives exactly once and the b-way-multiplied
  * `distinct()` disappears.
  *
  * Exists as a dedicated expression because the compositional
  * `exists(zip_with(slice…))` form runs interpreted per JOINED row
  * (pre-pruning, the widest point of the whole plan) — measured 80x
  * slower on a cluster-heavy corpus. Here it is a codegen'd loop over
  * at most `band` elements. The int form exists because band keys of
  * `bandBits <= 32` fit 32 bits, and halving the carried key width
  * halves the band exchange's array payload (r19) — truncating casts
  * are injective on that domain, so equality (and therefore the emitted
  * pair set) is unchanged.
  */
case class SharesEarlierBand(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "shares_earlier_band"

  // both prefix sides MUST carry the same element width: the generated
  // loop reads both through `first`'s accessor, so a long-keyed
  // persisted side next to an int-narrowed fresh side would silently
  // read garbage (two packed ints as one long) instead of failing —
  // refuse at analysis time
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _), IntegerType)
          if a == b && (a == IntegerType || a == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (f, s, t) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two band-key arrays of the SAME int/long " +
          s"element type and an int band (got $f, $s, $t) — mixed key " +
          "widths mean one side was prepped with intKeys and the other " +
          "was not (e.g. persisted long-keyed state next to int-narrowed " +
          "fresh prep)")
    }
  }

  private lazy val elemIsInt =
    first.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override def nullSafeEval(l: Any, r: Any, b: Any): Any = {
    val lks = l.asInstanceOf[ArrayData]
    val rks = r.asInstanceOf[ArrayData]
    val band = b.asInstanceOf[Int]
    var i = 0
    var found = false
    while (!found && i < band) {
      found =
        if (elemIsInt) lks.getInt(i) == rks.getInt(i)
        else lks.getLong(i) == rks.getLong(i)
      i += 1
    }
    found
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r, b) => {
      val i = ctx.freshName("i")
      val get = if (elemIsInt) "getInt" else "getLong"
      s"""
         |${ev.value} = false;
         |for (int $i = 0; !${ev.value} && $i < $b; $i++) {
         |  ${ev.value} = $l.$get($i) == $r.$get($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SharesEarlierBand =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SharesEarlierBand {
  def of(lks: Column, rks: Column, band: Column): Column =
    toColumn(SharesEarlierBand(toExpression(lks), toExpression(rks),
      toExpression(band)))
}
