package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as primitives, composed from existing
  * operators so Catalyst keeps optimizing them (the builder-brief
  * preference order: compose first, custom plans only when composition
  * can't express the semantics).
  */
object Joins {

  /** As-of join: for every left row, attach the LATEST right row with
    * `right.ts <= left.ts` within the same key — the standard
    * point-in-time lookup (feature stores, slowly-changing dimensions,
    * last-sensor-reading-before-event). Left rows with no prior right
    * row keep nulls.
    *
    * Implemented as the union-and-carry-forward pattern, NOT a range
    * join: tag both sides, union, `last(_, ignoreNulls)` over a
    * (key, ts)-sorted running window, keep the left rows. One shuffle +
    * one sort on the key — the cost of a single groupBy — where a naive
    * `l.ts >= r.ts` theta-join is a per-key cross product (quadratic in
    * the key's row count, a guaranteed straggler at 100 TB on any hot
    * key).
    *
    * Right rows are first reduced to one per (key, ts) — greatest
    * `ordCol` wins, payload follows it via `max_by` — so tie semantics
    * are deterministic and match engines with native ASOF joins (one
    * candidate per timestamp; a right row at exactly `left.ts` DOES
    * match).
    *
    * `rightCols` (must include `ordCol`, must not collide with left
    * column names) are the right-side payload columns carried into the
    * output.
    *
    * `toleranceSec` (pandas `merge_asof` tolerance / kdb wj semantics):
    * when set, a match older than `left.ts - tolerance` yields nulls
    * instead — the matched right timestamp rides the same carry-forward
    * window, so the bound costs one extra window column, never a range
    * join.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightCols: Seq[String], ordCol: String,
      toleranceSec: Option[Double] = None): DataFrame = {
    require(rightCols.contains(ordCol), "rightCols must include ordCol")
    val leftCols = left.columns.toSeq
    require(rightCols.forall(!leftCols.contains(_)),
      "rightCols must not collide with left column names")

    val payload = rightCols.filterNot(_ == ordCol)
    val aggs = max(col(ordCol)).as(ordCol) +:
      payload.map(c => max_by(col(c), col(ordCol)).as(c))
    val rightDedup0 = right.groupBy((keyCols :+ tsCol).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    // with a tolerance the matched right ts must survive the carry
    val rightDedup =
      if (toleranceSec.isDefined) rightDedup0.withColumn("__asof_ts", col(tsCol))
      else rightDedup0
    val carry = rightCols ++ (if (toleranceSec.isDefined) Seq("__asof_ts") else Nil)

    val lTagged = left.select(
      leftCols.map(col) ++
        carry.map(c =>
          lit(null).cast(rightDedup.schema(c).dataType).as(s"__r_$c")) :+
        lit(1).as("__side"): _*)
    val rTagged = rightDedup.select(
      leftCols.map(c =>
        if (keyCols.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        carry.map(c => col(c).as(s"__r_$c")) :+
        lit(0).as("__side"): _*)

    // right rows sort BEFORE left rows at the same ts (`<=` semantics)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def matched(c: String): Column =
      last(col(s"__r_$c"), ignoreNulls = true).over(w)
    val outCols = toleranceSec match {
      case None => rightCols.map(c => matched(c).as(c))
      case Some(tol) =>
        val within =
          col(tsCol).cast("double") - matched("__asof_ts").cast("double") <= tol
        rightCols.map(c => when(within, matched(c)).as(c))
    }

    lTagged.unionByName(rTagged)
      .select(leftCols.map(col) ++ outCols :+ col("__side"): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
