package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Standing streaming SummingMerge — the ClickHouse materialized-view
  * pattern (SummingMergeTree / AggregatingMergeTree MV): a rollup table
  * maintained incrementally, one fold per micro-batch, queryable at any
  * batch boundary. The admission fold is addition — associative and
  * commutative — so replays are idempotent via the batch-id overwrite
  * contract, and each emitted row equals the batch aggregate over the
  * key's FULL history (the replay oracle checks exactly that).
  *
  * Accumulator discipline: every fold casts back to `accType` (default
  * DECIMAL(28,2)) so the state schema stays FIXED across batches —
  * decimal sums otherwise widen per fold (18,2 -> 28,2 -> 38,2 -> ...)
  * and a drifting schema would poison the persisted state. Exact
  * arithmetic only (integers / decimals), as with
  * [[graft.operators.MergeSemantics.summingMerge]].
  *
  * Scale shape (the [[StreamingReplacingMerge]] recipe): state rows are
  * `kb = hash(key)`-bucketed, reads prune to the batch's buckets and
  * SEMI-join the broadcast batch keys; one state row per touched key
  * per batch. [[compact]] folds files only.
  */
final class StreamingSummingMerge(spark: SparkSession, stateDir: String,
    keyCol: String, sumCols: Seq[String],
    accType: String = "decimal(28,2)", nBuckets: Int = 64)
    extends Serializable {

  require(sumCols.nonEmpty, "at least one sum column")
  require(sumCols.distinct.size == sumCols.size, "sum columns must be distinct")

  private val state = new BatchedState(spark, s"$stateDir/sums", Seq("kb"))

  private def kBucket(k: Column): Column =
    pmod(xxhash64(k), lit(nBuckets)).cast("int")

  private val stateParams = Map("keyCol" -> keyCol,
    "sumCols" -> sumCols.mkString(","), "accType" -> accType,
    "nBuckets" -> nBuckets.toString)
  @transient private var paramsChecked = false
  private def ensureAdmissible(batchId: Long): Unit = if (!paramsChecked) {
    BatchedState.validateParams(spark, stateDir, stateParams)
    BatchedState.requireMonotonicBatchId(batchId, Seq(state), stateDir)
    paramsChecked = true
  }

  private val accDataType =
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(accType)
  private val stateSchema = StructType(
    StructField("k", LongType) +:
      sumCols.map(c => StructField(c, accDataType)) :+
      StructField("kb", IntegerType))

  private def fold(df: DataFrame): DataFrame =
    df.groupBy(col("k"))
      .agg(sum(col(sumCols.head)).cast(accType).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).cast(accType).as(c)): _*)

  private def batchSums(batch: DataFrame): DataFrame =
    fold(batch.select(col(keyCol).cast("long").as("k") +:
      sumCols.map(c => col(c).cast(accType).as(c)): _*))

  /** Seed the standing rollup from a (possibly empty) history, REPLACING
    * any previous state under `stateDir`.
    */
  def seed(history: DataFrame): Unit = {
    BatchedState.clearParams(spark, stateDir)
    state.reset()
    state.seed(batchSums(history).withColumn("kb", kBucket(col("k"))))
    BatchedState.writeParams(spark, stateDir, stateParams)
    paramsChecked = true
  }

  /** Admit micro-batch `batchId`: fold the batch's sums into the rollup
    * and emit (keyCol, sumCols...) for every touched key — the sums over
    * the key's full history so far.
    */
  def admit(batch: DataFrame, batchId: Long): DataFrame = {
    ensureAdmissible(batchId)
    val fresh = batchSums(batch)
      .withColumn("kb", kBucket(col("k"))).localCheckpoint()
    val kbs = fresh.select("kb").distinct().collect().map(_.getInt(0))
    // each state row carries the key's FULL total as of its batch, so —
    // addition not being idempotent — only the NEWEST row per key may
    // enter the fold (the StreamingReplacingMerge read, not the
    // max-fold the monotone-flag operators use)
    val refRaw = state.read(before = batchId, fallback = Some(stateSchema))
      .where(col("kb").isin(kbs.toIndexedSeq.map(Int.box): _*))
      .join(broadcast(fresh.select(col("k"))), Seq("k"), "left_semi")
      .select(col("k") +: col("batch") +: sumCols.map(col): _*)
    val ref = graft.operators.MergeSemantics
      .replacingMerge(refRaw, Seq("k"), "batch").drop("batch")
    val merged = fold(ref.unionByName(
        fresh.select(col("k") +: sumCols.map(col): _*)))
      .localCheckpoint() // materialize before the state append
    state.append(merged.withColumn("kb", kBucket(col("k"))), batchId)
    merged.select(col("k").as(keyCol) +: sumCols.map(col): _*)
  }

  /** File compaction only ([[StreamingReplacingMerge.compact]]
    * contract).
    */
  def compact(upTo: Long = Long.MaxValue): Unit =
    state.compact(Long.MinValue, upTo)

  /** Run the standing rollup over a stream. */
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
