package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse MergeTree table-engine FINAL semantics as batch operators —
  * what the rows the reference sinks (sink/ChWriter.scala feeds
  * Replacing/Summing/Collapsing tables in practice) MEAN once the engine
  * folds them. A user moving off the sinker re-reads raw appended rows
  * here and gets the same folded table the CH engine would serve.
  *
  * All three are ONE map-side-combined aggregate on the key — the exact
  * shape CH's background merges amortize, and the right 100 TB plan: the
  * shuffle carries one partially-folded row per (mapper, key), never the
  * raw appends.
  */
object MergeSemantics {

  private def payloadCols(df: DataFrame, keyCols: Seq[String],
      exclude: Seq[String]): Seq[String] =
    df.columns.toSeq.filterNot(c => keyCols.contains(c) || exclude.contains(c))

  /** ReplacingMergeTree FINAL: one row per key, the greatest `verCol`
    * wins and its payload follows ATOMICALLY (whole-row max over a
    * (version, payload...) struct — per-column max_by would stitch
    * columns from different versions on version ties). Version ties
    * break deterministically by payload lexicographic order, where CH
    * itself keeps an insertion-order-dependent row — determinism is the
    * stricter, replayable contract. This is the CDC upsert: appends with
    * a monotonic version column fold to current state.
    */
  def replacingMerge(df: DataFrame, keyCols: Seq[String],
      verCol: String): DataFrame = {
    val payload = payloadCols(df, keyCols, Seq(verCol))
    val packed = struct((verCol +: payload).map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max(packed).as("__r"))
      .select(keyCols.map(col) ++
        (verCol +: payload).map(c => col("__r").getField(c).as(c)): _*)
  }

  /** SummingMergeTree FINAL: per key, `sumCols` sum and everything else
    * collapses to the row carrying the greatest (sumCols-excluded)
    * payload struct — deterministic where CH keeps an arbitrary row.
    * Pass exact-arithmetic columns (integers / decimals) for
    * engine-reproducible sums; float sums are order-dependent by IEEE
    * and belong outside a replayable fold.
    */
  def summingMerge(df: DataFrame, keyCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(sumCols.nonEmpty, "at least one sum column")
    val others = payloadCols(df, keyCols, sumCols)
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      (if (others.isEmpty) Nil
       else Seq(max(struct(others.map(col): _*)).as("__o")))
    val out = df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    if (others.isEmpty) out
    else out.select(keyCols.map(col) ++ sumCols.map(col) ++
      others.map(c => col("__o").getField(c).as(c)): _*)
  }

  /** SummingMergeTree Map-column semantics (CH sums `Map` columns key-
    * wise on merge; `sumMap` aggregates the same way): per key the
    * element-wise sum of `mapCol` entries across rows, reassembled as a
    * map with entries in key order. Two narrow shuffles — the entry
    * explode is scan-local, (key, mapKey) partial sums combine map-side,
    * and the reassembly groups rows already bounded by the key space.
    * Exact-arithmetic value types (integer / decimal) for replayable
    * sums, as with [[summingMerge]].
    */
  def sumMap(df: DataFrame, keyCols: Seq[String], mapCol: String): DataFrame =
    aggMap(df, keyCols, mapCol, sum)

  /** minMap / maxMap / avgMap siblings (CH's Map-combinator family all
    * share sumMap's fold shape — only the per-map-key aggregate
    * differs). avgMap changes the value type to DOUBLE, as CH does.
    */
  def minMap(df: DataFrame, keyCols: Seq[String], mapCol: String): DataFrame =
    aggMap(df, keyCols, mapCol, min)
  def maxMap(df: DataFrame, keyCols: Seq[String], mapCol: String): DataFrame =
    aggMap(df, keyCols, mapCol, max)
  def avgMap(df: DataFrame, keyCols: Seq[String], mapCol: String): DataFrame =
    aggMap(df, keyCols, mapCol, avg)

  /** Shared fold for the `*Map` combinator family: per (key, map key),
    * aggregate the map values with `fn`, then reassemble one sorted map
    * per key. Two map-side-combined aggregates; the shuffle carries one
    * partially-folded row per (mapper, key, map key), never raw entries.
    */
  def aggMap(df: DataFrame, keyCols: Seq[String], mapCol: String,
      fn: Column => Column): DataFrame =
    // explode_outer: a key whose mapCol is NULL or empty on every row
    // still surfaces with an empty map (SummingMergeTree keeps the key
    // row; plain explode would drop it). The null entry rows fold away
    // in the reassembly because collect_list skips null structs.
    df.select(keyCols.map(col) :+
        explode_outer(col(mapCol)).as(Seq("__mk", "__mv")): _*)
      .groupBy((keyCols :+ "__mk").map(col): _*)
      .agg(fn(col("__mv")).as("__sv"))
      .groupBy(keyCols.map(col): _*)
      .agg(map_from_entries(sort_array(collect_list(
        when(col("__mk").isNotNull,
          struct(col("__mk"), col("__sv")))))).as(mapCol))

  /** VersionedCollapsingMergeTree FINAL: cancellations pair with the
    * state row carrying the SAME (key, version) — unlike plain
    * Collapsing, a cancel for an old version never consumes a newer
    * state. Per (key, version) the net sign decides: net 0 folds to
    * nothing (a matched +1/-1 pair), net != 0 survives as one row with
    * sign = sgn(net) and the payload of a row on that side (struct max —
    * well-formed inputs repeat the state payload on the cancel, so this
    * is a no-op tiebreak). Output is the folded TABLE (all surviving
    * versions, sign column included); chain [[replacingMerge]] over the
    * sign=1 survivors for the current-state read.
    *
    * One map-side-combined aggregate on (key, version) — at 100 TB the
    * shuffle carries one partially-folded row per (mapper, key, version),
    * never the raw appends.
    */
  def versionedCollapsingMerge(df: DataFrame, keyCols: Seq[String],
      signCol: String, verCol: String): DataFrame = {
    val payload = payloadCols(df, keyCols, Seq(signCol, verCol))
    val packed = struct(payload.map(col): _*)
    df.groupBy((keyCols :+ verCol).map(col): _*)
      .agg(sum(col(signCol)).as("__net"),
        max(when(col(signCol) === 1, packed)).as("__p"),
        max(when(col(signCol) === -1, packed)).as("__m"))
      .filter(col("__net") =!= 0)
      .select(keyCols.map(col) ++ Seq(col(verCol),
          when(col("__net") > 0, lit(1)).otherwise(lit(-1)).as(signCol)) ++
        payload.map(c => when(col("__net") > 0, col("__p").getField(c))
          .otherwise(col("__m").getField(c)).as(c)): _*)
  }

  /** CollapsingMergeTree FINAL: rows arrive as (+1) states and (-1)
    * cancellations; per key the net sign decides survival — net > 0
    * keeps the greatest-`verCol` (+1) row, net <= 0 folds to nothing.
    * One aggregate computes both the net and the surviving row; the
    * filter is on the aggregated (one-row-per-key) side.
    */
  def collapsingMerge(df: DataFrame, keyCols: Seq[String],
      signCol: String, verCol: String): DataFrame = {
    val payload = payloadCols(df, keyCols, Seq(signCol, verCol))
    val packed = struct((verCol +: payload).map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(sum(col(signCol)).as("__net"),
        max(when(col(signCol) === 1, packed)).as("__r"))
      .filter(col("__net") > 0)
      .select(keyCols.map(col) ++
        (verCol +: payload).map(c => col("__r").getField(c).as(c)): _*)
  }
}
