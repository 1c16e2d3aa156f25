package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

import graft.operators.ApproxAgg

/** Standing streaming uniqHLL — the streaming lift of
  * [[graft.operators.ApproxAgg.uniqHll]], and the engine's
  * `-State`/`-Merge` combinator story in one operator: the persisted
  * state IS the register sketch (per (key, register) max rho), the
  * admission fold IS the HLL merge (register-wise max — associative,
  * commutative, idempotent), and every admission emits the estimate
  * over the key's FULL history so far. Because the merge is a plain
  * max, replays and restarts are idempotent by construction, and the
  * streaming estimate is EXACTLY the batch [[ApproxAgg.uniqHll]] over
  * the concatenated history — the replay oracle checks that equality.
  *
  * Scale shape (the [[StreamingReplacingMerge]] recipe): state rows are
  * `kb = hash(key)`-bucketed, reads prune to the batch's buckets and
  * SEMI-join the broadcast batch keys; at most 512 register rows per
  * touched key per batch flow anywhere. [[compact]] folds files only.
  */
final class StreamingUniqHll(spark: SparkSession, stateDir: String,
    keyCol: String, valueCol: String, nBuckets: Int = 64)
    extends Serializable {

  private val state = new BatchedState(spark, s"$stateDir/regs", Seq("kb"))

  private def kBucket(k: Column): Column =
    pmod(xxhash64(k), lit(nBuckets)).cast("int")

  private val stateParams = Map("keyCol" -> keyCol, "valueCol" -> valueCol,
    "p" -> ApproxAgg.HllP.toString, "nBuckets" -> nBuckets.toString)
  @transient private var paramsChecked = false
  private def ensureAdmissible(batchId: Long): Unit = if (!paramsChecked) {
    BatchedState.validateParams(spark, stateDir, stateParams)
    BatchedState.requireMonotonicBatchId(batchId, Seq(state), stateDir)
    paramsChecked = true
  }

  private val stateSchema = StructType(Seq(
    StructField("k", StringType), StructField("reg", IntegerType),
    StructField("m", IntegerType), StructField("kb", IntegerType)))

  private def batchRegisters(batch: DataFrame): DataFrame =
    ApproxAgg.hllRegisters(
      batch.select(col(keyCol).cast("string").as("k"),
        col(valueCol).as("__v")),
      Seq("k"), col("__v"))

  private def foldRegisters(df: DataFrame): DataFrame =
    df.groupBy(col("k"), col("reg")).agg(max(col("m")).as("m"))

  /** Seed the standing sketch from a (possibly empty) history, REPLACING
    * any previous state under `stateDir`.
    */
  def seed(history: DataFrame): Unit = {
    BatchedState.clearParams(spark, stateDir)
    state.reset()
    state.seed(batchRegisters(history).withColumn("kb", kBucket(col("k"))))
    BatchedState.writeParams(spark, stateDir, stateParams)
    paramsChecked = true
  }

  /** Admit micro-batch `batchId`: merge the batch's registers into the
    * standing sketch and emit (keyCol, est, n_regs) for every key
    * touched by the batch — the estimate over the key's full history.
    */
  def admit(batch: DataFrame, batchId: Long): DataFrame = {
    ensureAdmissible(batchId)
    val fresh = batchRegisters(batch)
      .withColumn("kb", kBucket(col("k"))).localCheckpoint()
    val kbs = fresh.select("kb").distinct().collect().map(_.getInt(0))
    val ref = state.read(before = batchId, fallback = Some(stateSchema))
      .where(col("kb").isin(kbs.toIndexedSeq.map(Int.box): _*))
      .join(broadcast(fresh.select(col("k")).distinct()), Seq("k"), "left_semi")
      .select(col("k"), col("reg"), col("m"))
    val merged = foldRegisters(ref.unionByName(
        fresh.select(col("k"), col("reg"), col("m"))))
      .localCheckpoint() // materialize before the state append
    state.append(merged.withColumn("kb", kBucket(col("k"))), batchId)
    ApproxAgg.hllEstimate(merged, Seq("k"))
      .select(col("k").as(keyCol), col("est"), col("n_regs"))
  }

  /** File compaction only ([[StreamingReplacingMerge.compact]]
    * contract).
    */
  def compact(upTo: Long = Long.MaxValue): Unit =
    state.compact(Long.MinValue, upTo)

  /** Run the standing sketch over a stream. */
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

/** Standing streaming KMV distinct sketch — the streaming lift of
  * [[graft.operators.ApproxAgg.uniqKmv]]: the persisted state IS the
  * per-key k-smallest-distinct-hash rows, and the admission fold IS the
  * KMV merge (min-k of the union — idempotent, so crash-replay is safe
  * without a newest-row read discipline, same as the HLL register
  * max-fold). State stays <= k rows per key per append; reads prune to
  * the batch's `kb` buckets and semi-join the broadcast batch keys.
  */
final class StreamingUniqKmv(spark: SparkSession, stateDir: String,
    keyCol: String, valueCol: String, k: Int = 256, nBuckets: Int = 64)
    extends Serializable {

  private val state = new BatchedState(spark, s"$stateDir/kmv", Seq("kb"))

  private def kBucket(c: Column): Column =
    pmod(xxhash64(c), lit(nBuckets)).cast("int")

  private val stateParams = Map("keyCol" -> keyCol, "valueCol" -> valueCol,
    "k" -> k.toString, "nBuckets" -> nBuckets.toString)
  @transient private var paramsChecked = false
  private def ensureAdmissible(batchId: Long): Unit = if (!paramsChecked) {
    BatchedState.validateParams(spark, stateDir, stateParams)
    BatchedState.requireMonotonicBatchId(batchId, Seq(state), stateDir)
    paramsChecked = true
  }

  private val stateSchema = StructType(Seq(
    StructField("k", StringType), StructField("h", LongType),
    StructField("kb", IntegerType)))

  private def batchHashes(batch: DataFrame): DataFrame =
    batch.select(col(keyCol).cast("string").as("k"),
        graft.functions.PortableHash.md5Lo(col(valueCol)).as("h"))
      .filter(col("h").isNotNull)

  /** min-k fold over (k, h) rows via the bounded-heap aggregate — the
    * shuffle carries at most k longs per (mapper, key).
    */
  private def foldMinK(df: DataFrame): DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(
      new ApproxAgg.MinKDistinctAgg(k))
    df.groupBy(col("k")).agg(agg(col("h")).as("ks"))
  }

  def seed(history: DataFrame): Unit = {
    BatchedState.clearParams(spark, stateDir)
    state.reset()
    state.seed(foldMinK(batchHashes(history))
      .select(col("k"), explode(col("ks")).as("h"))
      .withColumn("kb", kBucket(col("k"))))
    BatchedState.writeParams(spark, stateDir, stateParams)
    paramsChecked = true
  }

  /** Admit micro-batch `batchId`: merge the batch's hashes into the
    * standing sketch and emit (keyCol, est, n_kept) for every key the
    * batch touched — the estimate over the key's full history.
    */
  def admit(batch: DataFrame, batchId: Long): DataFrame = {
    ensureAdmissible(batchId)
    val fresh = batchHashes(batch)
      .withColumn("kb", kBucket(col("k"))).localCheckpoint()
    val kbs = fresh.select("kb").distinct().collect().map(_.getInt(0))
    val ref = state.read(before = batchId, fallback = Some(stateSchema))
      .where(col("kb").isin(kbs.toIndexedSeq.map(Int.box): _*))
      .join(broadcast(fresh.select(col("k")).distinct()), Seq("k"), "left_semi")
      .select(col("k"), col("h"))
    val merged = foldMinK(ref.unionByName(fresh.select(col("k"), col("h"))))
      .localCheckpoint() // materialize before the state append
    state.append(merged.select(col("k"), explode(col("ks")).as("h"))
      .withColumn("kb", kBucket(col("k"))), batchId)
    ApproxAgg.kmvEstimate(merged, Seq("k"), k)
      .select(col("k").as(keyCol), col("est"), col("n_kept"))
  }

  /** File compaction only ([[StreamingReplacingMerge.compact]]
    * contract).
    */
  def compact(upTo: Long = Long.MaxValue): Unit =
    state.compact(Long.MinValue, upTo)

  /** Run the standing sketch over a stream. */
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

/** Standing streaming quantile sketch — the streaming lift of
  * [[graft.operators.ApproxAgg.quantileSketch]]: the persisted state is
  * the per-(key, bucket) count histogram, the admission fold sums
  * counts, and every admission emits the requested quantiles over the
  * key's FULL history. Count addition is NOT idempotent, so — like
  * [[StreamingSummingMerge]] — reads take only the NEWEST state
  * histogram per key (each appended row-set carries the key's complete
  * merged histogram as of its batch).
  *
  * Scale shape: state rows are `kb = hash(key)`-bucketed and bounded by
  * the bucket space (~64·2^(sigBits-1) rows per key, corpus-size-
  * independent); reads prune to the batch's buckets and SEMI-join the
  * broadcast batch keys. [[compact]] folds files only.
  */
final class StreamingQuantile(spark: SparkSession, stateDir: String,
    keyCol: String, valueCol: String, quantiles: Seq[(String, Int, Int)],
    scale: Int = 100, sigBits: Int = 8, nBuckets: Int = 64)
    extends Serializable {

  require(quantiles.nonEmpty, "at least one quantile")

  private val state = new BatchedState(spark, s"$stateDir/hist", Seq("kb"))

  private def kBucket(k: Column): Column =
    pmod(xxhash64(k), lit(nBuckets)).cast("int")

  private val stateParams = Map("keyCol" -> keyCol, "valueCol" -> valueCol,
    "scale" -> scale.toString, "sigBits" -> sigBits.toString,
    "nBuckets" -> nBuckets.toString)
  @transient private var paramsChecked = false
  private def ensureAdmissible(batchId: Long): Unit = if (!paramsChecked) {
    BatchedState.validateParams(spark, stateDir, stateParams)
    BatchedState.requireMonotonicBatchId(batchId, Seq(state), stateDir)
    paramsChecked = true
  }

  private val stateSchema = StructType(Seq(
    StructField("k", StringType), StructField("blo", LongType),
    StructField("cnt", LongType), StructField("kb", IntegerType)))

  private def batchHist(batch: DataFrame): DataFrame =
    ApproxAgg.quantileHistogram(
      batch.select(col(keyCol).cast("string").as("k"),
        col(valueCol).as("__v")),
      Seq("k"), col("__v"), scale, sigBits)

  private def foldHist(df: DataFrame): DataFrame =
    df.groupBy(col("k"), col("blo")).agg(sum(col("cnt")).as("cnt"))

  /** Seed the standing histogram from a (possibly empty) history,
    * REPLACING any previous state under `stateDir`.
    */
  def seed(history: DataFrame): Unit = {
    BatchedState.clearParams(spark, stateDir)
    state.reset()
    state.seed(batchHist(history).withColumn("kb", kBucket(col("k"))))
    BatchedState.writeParams(spark, stateDir, stateParams)
    paramsChecked = true
  }

  /** Admit micro-batch `batchId`: fold the batch's histogram into the
    * standing one and emit (keyCol, n, quantiles...) for every touched
    * key over its full history.
    */
  def admit(batch: DataFrame, batchId: Long): DataFrame = {
    ensureAdmissible(batchId)
    val fresh = batchHist(batch)
      .withColumn("kb", kBucket(col("k"))).localCheckpoint()
    val kbs = fresh.select("kb").distinct().collect().map(_.getInt(0))
    val refRaw = state.read(before = batchId, fallback = Some(stateSchema))
      .where(col("kb").isin(kbs.toIndexedSeq.map(Int.box): _*))
      .join(broadcast(fresh.select(col("k")).distinct()), Seq("k"), "left_semi")
      .select(col("k"), col("blo"), col("cnt"), col("batch"))
    // newest complete histogram per key (counts are not idempotent)
    val latest = refRaw.groupBy(col("k")).agg(max(col("batch")).as("batch"))
    val ref = refRaw.join(broadcast(latest), Seq("k", "batch"))
      .select(col("k"), col("blo"), col("cnt"))
    val merged = foldHist(ref.unionByName(
        fresh.select(col("k"), col("blo"), col("cnt"))))
      .localCheckpoint() // materialize before the state append
    state.append(merged.withColumn("kb", kBucket(col("k"))), batchId)
    ApproxAgg.quantilesOfHistogram(merged, Seq("k"), quantiles, scale)
      .select(col("k").as(keyCol) +: col("n") +: quantiles.map {
        case (name, _, _) => col(name) }: _*)
  }

  /** File compaction only ([[StreamingReplacingMerge.compact]]
    * contract).
    */
  def compact(upTo: Long = Long.MaxValue): Unit =
    state.compact(Long.MinValue, upTo)

  /** Run the standing quantile sketch over a stream. */
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
