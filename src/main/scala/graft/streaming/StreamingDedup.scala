package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

import graft.operators.Dedup

/** Standing incremental near-dup admission — the streaming lift of
  * [[graft.operators.Dedup.nearDupsAgainstMinhash]]: the reference
  * corpus's minhash state (shingle + banded-signature tables) is
  * persisted ONCE; each arriving micro-batch computes its own signatures
  * in one scan-local pass, band-joins against the persisted state, exact-
  * Jaccard-verifies the candidates, and is then appended to the state so
  * later batches also dedup against it. Admission cost per batch scales
  * with |batch| x band-collision rate — never with corpus size, which is
  * the only shape that survives a standing 100 TB corpus.
  *
  * Delivery: runs under `foreachBatch`, so a crashed batch is replayed
  * (at-least-once). State appends are made idempotent at READ time —
  * shingles dedup on id, band candidates are `distinct` — so a replayed
  * append cannot duplicate pairs; the pairs output itself is
  * `localCheckpoint`ed before the state append so the batch can never
  * band against itself.
  */
final class StreamingDedup(spark: SparkSession, stateDir: String,
    idCol: String, textCol: String,
    n: Int = 3, bands: Int = 8, rows: Int = 4,
    threshold: Double = 0.7) extends Serializable {

  private val shinglesDir = s"$stateDir/shingles"
  private val bandedDir   = s"$stateDir/banded"

  /** Seed the persisted reference state (signatures computed once). */
  def seed(reference: DataFrame): Unit = {
    val (sh, banded) = Dedup.prepMinhash(reference, idCol, textCol, n, bands, rows)
    sh.write.mode("overwrite").parquet(shinglesDir)
    banded.write.mode("overwrite").parquet(bandedDir)
  }

  /** Admit one batch: cross-corpus (ref_id, new_id, jaccard) pairs
    * against everything seeded or admitted so far, then fold the batch
    * into the state.
    */
  def admit(batch: DataFrame): DataFrame = {
    val (shNew, bNew) = Dedup.prepMinhash(batch, idCol, textCol, n, bands, rows)
    // replay safety: a crashed-and-replayed batch whose state append
    // already landed must produce the SAME pairs as the clean run, so
    // the state side excludes the batch's own ids (broadcast anti join)
    // — otherwise the replay would emit batch-vs-batch pairs a clean run
    // never produces. dropDuplicates covers the doubled state rows.
    val freshIds = shNew.select(col("id"))
    val shRef = spark.read.parquet(shinglesDir).dropDuplicates("id")
      .join(broadcast(freshIds), Seq("id"), "left_anti")
    val bRef  = spark.read.parquet(bandedDir)
      .join(broadcast(freshIds.withColumnRenamed("id", "doc_id")),
        Seq("doc_id"), "left_anti")
    // localCheckpoint pins the result BEFORE the state grows: without it
    // a lazy consumer would re-plan the band join over state that now
    // contains the batch itself
    val pairs = Dedup.nearDupsPrepared(shRef, bRef, shNew, bNew, threshold)
      .localCheckpoint()
    shNew.write.mode("append").parquet(shinglesDir)
    bNew.write.mode("append").parquet(bandedDir)
    pairs
  }

  /** Wire a streaming source into the standing pipeline: each micro-batch
    * is admitted and its pairs appended to `pairsDir`.
    */
  def attach(source: DataFrame, pairsDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admit(batch).write.mode("append").parquet(pairsDir)
        ()
      }
}

/** Streaming SemDeDup: semantic near-dup admission against a persisted
  * cell-partitioned corpus. `seed` trains the deterministic IVF
  * centroids ONCE ([[graft.operators.Similarity.trainCentroids]]),
  * persists them ([[graft.operators.Similarity.IvfIndex]]) beside the
  * cell-assigned corpus vectors; each batch then assigns its vectors to
  * cells with the SAME loaded centroids (a scan-local argmax — the cell
  * structure never drifts between batches) and compares ONLY within
  * shared cells — the SemDeDup trade at ingestion time: per-batch cost
  * is |batch| x mean cell occupancy, never |batch| x corpus.
  */
final class StreamingSemanticDedup(spark: SparkSession, stateDir: String,
    idCol: String, vecCol: String, nCells: Int,
    threshold: Double = 0.99) extends Serializable {

  import graft.operators.Similarity
  import org.apache.spark.sql.types.{ArrayType, DoubleType}

  private val vecsDir  = s"$stateDir/vectors"
  private val indexDir = s"$stateDir/index"

  // the index is immutable after seed(): cache it instead of paying a
  // parquet read + driver collect per micro-batch
  @transient private var centroidsCache: Similarity.Centroids = _
  private def centroids: Similarity.Centroids = {
    if (centroidsCache == null)
      centroidsCache = Similarity.IvfIndex.load(spark, indexDir)
    centroidsCache
  }

  /** Train centroids on the reference corpus, persist index + assigned
    * vectors.
    */
  def seed(reference: DataFrame): Unit = {
    val trained = Similarity.trainCentroids(reference, nCells, idCol, vecCol)
    Similarity.IvfIndex.save(trained, spark, indexDir)
    centroidsCache = trained
    reference.select(col(idCol).as("id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .withColumn("cell", trained.assignCell(col("v")))
      .write.mode("overwrite").parquet(vecsDir)
  }

  /** Admit one batch: (ref_id, new_id, cell, cos) pairs within shared
    * cells vs everything seeded or admitted so far, then fold the batch
    * into the state. Same replay safety as the LSH twins.
    */
  def admit(batch: DataFrame): DataFrame = {
    val fresh = batch.select(col(idCol).as("id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .withColumn("cell", centroids.assignCell(col("v")))
    // replay safety: exclude the batch's own ids from the state side
    val ref = spark.read.parquet(vecsDir).dropDuplicates("id")
      .join(broadcast(fresh.select(col("id"))), Seq("id"), "left_anti")
    val pairs = ref.as("l").join(fresh.as("r"),
        col("l.cell") === col("r.cell") && col("l.id") =!= col("r.id"))
      .select(col("l.id").as("ref_id"), col("r.id").as("new_id"),
        col("l.cell").as("cell"),
        Similarity.cosine(col("l.v"), col("r.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .localCheckpoint()
    fresh.write.mode("append").parquet(vecsDir)
    pairs
  }

  def attach(source: DataFrame, pairsDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admit(batch).write.mode("append").parquet(pairsDir)
        ()
      }
}

/** The embedding twin of [[StreamingDedup]]: persisted state is the
  * (id, vector) table plus packed RHP band keys (one row per vector,
  * re-exploded at join time — never 16x materialized on disk). Same
  * replay-safety: pairs localCheckpoint before the state append, state
  * reads dedup on id.
  */
final class StreamingEmbeddingDedup(spark: SparkSession, stateDir: String,
    idCol: String, vecCol: String, dims: Int,
    nBits: Int = 384, bandBits: Int = 16,
    threshold: Double = 0.99) extends Serializable {

  import graft.operators.Similarity

  private val vecsDir = s"$stateDir/vectors"
  private val keysDir = s"$stateDir/keys"

  def seed(reference: DataFrame): Unit = {
    val (v, k) = Similarity.prepEmbedding(reference, dims, nBits, bandBits,
      idCol, vecCol)
    v.write.mode("overwrite").parquet(vecsDir)
    k.write.mode("overwrite").parquet(keysDir)
  }

  def admit(batch: DataFrame): DataFrame = {
    val (vNew, kNew) = Similarity.prepEmbedding(batch, dims, nBits, bandBits,
      idCol, vecCol)
    // replay safety: exclude the batch's own ids from the state side,
    // same as the minhash twin
    val freshIds = vNew.select(col("id"))
    val vRef = spark.read.parquet(vecsDir).dropDuplicates("id")
      .join(broadcast(freshIds), Seq("id"), "left_anti")
    val kRef = spark.read.parquet(keysDir).dropDuplicates("id")
      .join(broadcast(freshIds), Seq("id"), "left_anti")
    val pairs = Similarity.nearDupsPreparedEmbedding(vRef, kRef, vNew, kNew,
      threshold).localCheckpoint()
    vNew.write.mode("append").parquet(vecsDir)
    kNew.write.mode("append").parquet(keysDir)
    pairs
  }

  def attach(source: DataFrame, pairsDir: String,
      checkpointDir: String): DataStreamWriter[Row] =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admit(batch).write.mode("append").parquet(pairsDir)
        ()
      }
}
