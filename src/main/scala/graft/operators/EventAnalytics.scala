package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ClickHouse-style event-sequence analytics (windowFunnel / retention —
  * the queries users run ON the tables the reference sinks into; this
  * engine answers them natively so the sink's downstream workload moves
  * with it). Reference context: housepower/clickhouse_sinker feeds
  * ClickHouse exactly these funnel/retention workloads (README.md:1-40).
  */
object EventAnalytics {

  /** windowFunnel: per user, the deepest prefix of `steps` that occurs
    * in timestamp order within `windowSec` seconds of the chain's FIRST
    * step — exists-chain semantics: level >= k iff there are events
    * e_1..e_k with type(e_i) = steps(i-1), ts_1 <= ts_2 <= ... <= ts_k
    * and ts_k <= ts_1 + window. Users with step events but no complete
    * level-1 event report 0.
    *
    * Implementation: events filtered to the step set SCAN-LOCAL (the
    * only shuffle carries (user, ts, stepIdx) for step events only),
    * then one sorted-group pass per user. For each chain start the walk
    * greedily takes the earliest valid next step, which decides
    * exists-chain exactly (exchange argument: an earlier step-i pick
    * only widens step-i+1's choices). Per-user work is
    * O(starts * events) over the user's OWN events — bounded by
    * per-user activity, never corpus-sized; a join-per-level
    * formulation would instead build per-user cross products per step.
    * The sorted-group scan is one of the justified imperative islands
    * (like the binary decoders): no Catalyst expression walks a
    * variable-length chain.
    */
  def windowFunnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowSec: Long,
      mode: String = "default"): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(windowSec > 0, "windowSec must be positive")
    require(Modes.contains(mode), s"mode must be one of $Modes")
    val spark = df.sparkSession
    import spark.implicits._
    // step index projected BEFORE grouping so ties sort by (ts, stepIdx):
    // funnelWalk is a forward pass, so an equal-timestamp higher step
    // stored ahead of a lower one would be invisible to the chain even
    // though ts_i <= ts_{i+1} admits it (the streaming twin sorts
    // struct(t, s) for the same reason)
    val idxCol = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (st, i)) => when(col(typeCol) === st, lit(i)).otherwise(acc)
    }
    val typed = df.select(col(userCol).cast("long").as("u"),
        unix_micros(col(tsCol).cast("timestamp")).as("t"),
        idxCol.as("s"))
      .filter(col("s") >= 0)
      .as[(Long, Long, Int)]
    val winMicros = windowSec * 1000000L
    val k = steps.size
    val m = mode
    typed.groupByKey(_._1)
      .flatMapSortedGroups($"t", $"s") { (u: Long, it: Iterator[(Long, Long, Int)]) =>
        val evs = it.map(r => (r._2, r._3)).toArray
        Iterator((u, funnelWalk(evs, k, winMicros, m)))
      }
      .toDF(userCol, "level")
  }

  /** The ClickHouse windowFunnel mode set: `default` (ts_i <= ts_{i+1}),
    * `strict_increase` (ts_i < ts_{i+1}), `strict_dedup` (a repeat of an
    * already-matched step interrupts the chain), `strict_order` (any
    * step event other than the expected next one interrupts).
    */
  val Modes: Set[String] =
    Set("default", "strict_increase", "strict_dedup", "strict_order")

  /** The per-user chain walk over `(tsMicros, stepIdx)` events sorted by
    * (ts, stepIdx): deepest chain of steps `0..k-1` whose span fits
    * `winMicros` of the chain start, under the given mode's advance/
    * interrupt rules. For `default` and `strict_increase` the greedy
    * earliest-pick walk decides exists-chain exactly (exchange
    * argument); the strict interrupt modes are inherently positional, so
    * the walk IS the semantics. Shared by the batch [[windowFunnel]] and
    * the standing streaming twin (default mode).
    */
  private[graft] def funnelWalk(evs: Array[(Long, Int)], k: Int,
      winMicros: Long, mode: String = "default"): Int = {
    var best = 0
    var i = 0
    while (i < evs.length && best < k) {
      if (evs(i)._2 == 0) {
        val deadline = evs(i)._1 + winMicros
        var level = 1
        var lastTs = evs(i)._1
        var j = i + 1 // (ts, step) sort puts every extendable event after i
        var cut = false
        while (j < evs.length && level < k && !cut) {
          val (ts, s) = evs(j)
          if (ts > deadline) cut = true
          else mode match {
            case "strict_increase" =>
              if (s == level && ts > lastTs) { level += 1; lastTs = ts }
            case "strict_dedup" =>
              if (s == level) { level += 1; lastTs = ts }
              else if (s < level) cut = true // repeated matched step
            case "strict_order" =>
              if (s == level) { level += 1; lastTs = ts }
              else cut = true // any intervening step event interrupts
            case _ =>
              if (s == level) { level += 1; lastTs = ts }
          }
          j += 1
        }
        if (level > best) best = level
      }
      i += 1
    }
    best
  }

  /** sequenceCount('(?1).*(?2)...(?k)'): per user, the number of NON-
    * OVERLAPPING ordered completions of `steps` — the greedy automaton
    * ClickHouse runs: the level advances on the expected next step,
    * other events pass through, and a completion resets the automaton to
    * hunt the next chain from the following event. No time bound (the
    * `.*` pattern); for windowed chains see [[windowFunnel]]. Users with
    * no step events report 0 (they group-by out of the step-filtered
    * stream, so the caller left-joins if absent users matter — or use
    * the registry query's shape, which keeps every user with any step
    * event).
    *
    * Determinism: the automaton is a fold over the (ts, stepIdx)-sorted
    * event list — single-valued, no tie ambiguity, and small enough to
    * replay in SQL as a linear recursive CTE (the oracle does exactly
    * that).
    */
  def sequenceCount(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one step")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val spark = df.sparkSession
    import spark.implicits._
    val idxCol = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (st, i)) => when(col(typeCol) === st, lit(i)).otherwise(acc)
    }
    val typed = df.select(col(userCol).cast("long").as("u"),
        unix_micros(col(tsCol).cast("timestamp")).as("t"),
        idxCol.as("s"))
      .filter(col("s") >= 0)
      .as[(Long, Long, Int)]
    val k = steps.size
    typed.groupByKey(_._1)
      .flatMapSortedGroups($"t", $"s") { (u: Long, it: Iterator[(Long, Long, Int)]) =>
        var level = 0
        var cnt = 0
        it.foreach { r =>
          if (r._3 == level) {
            level += 1
            if (level == k) { cnt += 1; level = 0 }
          }
        }
        Iterator((u, cnt))
      }
      .toDF(userCol, "n_matches")
  }

  /** retention: per user, whether the ANCHOR condition held (`r0`) and,
    * for each follow-up condition i, whether BOTH the anchor and that
    * condition held (`r_i`) — ClickHouse `retention()` semantics, the
    * cohort-analysis primitive. One map-side-combined aggregate over the
    * user key; conditions are arbitrary boolean Columns (event type,
    * time bucket, property predicates), evaluated scan-local.
    */
  def retention(df: DataFrame, userCol: String,
      conds: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(conds.nonEmpty, "at least the anchor condition")
    val flags = conds.zipWithIndex.map { case (c, i) =>
      max(when(c, lit(1)).otherwise(lit(0))).as(s"__f$i")
    }
    df.groupBy(col(userCol)).agg(flags.head, flags.tail: _*)
      .select(col(userCol) +: conds.indices.map { i =>
        (if (i == 0) col("__f0") else col("__f0") * col(s"__f$i"))
          .cast("int").as(s"r$i")
      }: _*)
  }
}
