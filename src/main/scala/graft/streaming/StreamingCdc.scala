package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.MergeSemantics

/** Standing CDC materialization — the streaming lift of
  * [[graft.operators.MergeSemantics.replacingMerge]]: a persisted
  * keyed current-state view that every arriving micro-batch of updates
  * upserts into, emitting the post-upsert current row (+ previous
  * version) per touched key — the ReplacingMergeTree FINAL answer as a
  * continuously-maintained view. Out-of-order updates (version at or
  * below the standing one) are ignored by the fold and report
  * `changed = false`.
  *
  * Scale shape (the [[StreamingDecontamination]] recipe on the key
  * axis): state rows are directory-partitioned by `kb = hash(key)` and
  * every admission PRUNES the state read to the batch's (<= nBuckets)
  * bucket set, then SEMI-joins state against the broadcast batch keys —
  * the state scan is bounded by the batch's footprint, state never
  * shuffles corpus-wide. Appends store the batch's FOLDED rows (one row
  * per key per touching batch), so state grows with update history, not
  * raw update volume; [[compact]] folds FILES (never rows — an old
  * version may still be any untouched key's current, so age eviction is
  * deliberately not exposed on this tier). Idempotent overwrite appends
  * and replay-deterministic `read(before)` are [[BatchedState]]'s.
  */
final class StreamingReplacingMerge(spark: SparkSession, stateDir: String,
    keyCol: String, verCol: String, payloadCols: Seq[String],
    nBuckets: Int = 64) extends Serializable {

  private val cols = Seq(keyCol, verCol) ++ payloadCols
  private val state = new BatchedState(spark, s"$stateDir/rows", Seq("kb"))

  private def kBucket(k: Column): Column =
    pmod(xxhash64(k), lit(nBuckets)).cast("int")

  private val stateParams = Map("keyCol" -> keyCol, "verCol" -> verCol,
    "payload" -> payloadCols.mkString(","), "nBuckets" -> nBuckets.toString)
  @transient private var paramsChecked = false
  private def ensureAdmissible(batchId: Long): Unit = if (!paramsChecked) {
    BatchedState.validateParams(spark, stateDir, stateParams)
    BatchedState.requireMonotonicBatchId(batchId, Seq(state), stateDir)
    paramsChecked = true
  }

  private def folded(df: DataFrame): DataFrame =
    MergeSemantics.replacingMerge(df.select(cols.map(col): _*),
      Seq(keyCol), verCol)

  /** Seed the standing view from an initial snapshot (folded to one row
    * per key), REPLACING any previous state under `stateDir`.
    */
  def seed(snapshot: DataFrame): Unit = {
    BatchedState.clearParams(spark, stateDir)
    state.reset()
    state.seed(folded(snapshot).withColumn("kb", kBucket(col(keyCol))))
    BatchedState.writeParams(spark, stateDir, stateParams)
    paramsChecked = true
  }

  /** Upsert micro-batch `batchId` and return one row per touched key:
    * the post-upsert current row (`verCol`, payload) plus `prev_ver`
    * (null for first-seen keys) and `changed` (false when the batch's
    * update was stale or re-asserted the current version). Appends the
    * batch's folded rows; replay overwrites them idempotently and
    * `read(before)` keeps the view the clean run saw.
    */
  def admit(batch: DataFrame, batchId: Long): DataFrame = {
    ensureAdmissible(batchId)
    val fresh = folded(batch)
      .withColumn("kb", kBucket(col(keyCol))).localCheckpoint()
    val kbs = fresh.select("kb").distinct().collect().map(_.getInt(0))
    val ref = state.read(before = batchId, fallback = Some(fresh.schema))
      .where(col("kb").isin(kbs.toIndexedSeq.map(Int.box): _*))
      .join(broadcast(fresh.select(col(keyCol))), Seq(keyCol), "left_semi")
    val prev = folded(ref)
    val cur = folded(prev.unionByName(fresh.select(cols.map(col): _*)))
    // materialize BEFORE the state append: the plan references state
    // files a later compact may fold away
    val out = cur
      .join(prev.select(col(keyCol), col(verCol).as("prev_ver")),
        Seq(keyCol), "left")
      .withColumn("changed",
        col("prev_ver").isNull || col(verCol) =!= col("prev_ver"))
      .localCheckpoint()
    state.append(fresh, batchId)
    out
  }

  /** FILE compaction only: folds deltas `<= upTo` into one snapshot
    * without evicting any row — on this tier an aged row may still be an
    * untouched key's current state, so the `keepFrom` TTL is not
    * exposed. Call only for checkpoint-committed batch ids.
    */
  def compact(upTo: Long = Long.MaxValue): Unit =
    state.compact(Long.MinValue, upTo)

  /** Run the standing view over a stream: per micro-batch, admit +
    * write the touched-key changelog to `outDir/batch=<id>` (overwrite —
    * exactly-once per dir), optional periodic file compaction.
    */
  def attach(source: DataFrame, outDir: String,
      checkpointDir: String, autoCompactEvery: Int = 0): DataStreamWriter[Row] =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admit(batch, batchId).write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
        if (autoCompactEvery > 0 && batchId > 0 &&
          batchId % autoCompactEvery == 0) compact(upTo = batchId - 1)
        ()
      }
}
