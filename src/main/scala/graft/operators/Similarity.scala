package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GoHash

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Three tiers, by corpus size:
  *
  *   - [[bruteForceTopK]]: exact — broadcast the (small) query set and
  *     scan the corpus once; one window per query for top-k. The baseline
  *     and the verifier for the approximate tiers.
  *   - [[lshTopK]]: random-hyperplane LSH — per-row bit signature computed
  *     in codegen, candidates bucketed by signature band, exact re-rank
  *     inside buckets. Sub-linear candidate sets at 100 TB.
  *   - [[ivfTopK]]: IVF-style coarse quantization — assign each vector to
  *     its nearest of k centroids (broadcast), probe the query's nearest
  *     nprobe cells only. Centroids come from a sampled k-means-lite pass.
  *
  * Dot products are `zip_with` + `aggregate` (no UDF); hyperplanes are
  * deterministic pseudo-random literals derived from xxh64(seed, dim), so
  * results are reproducible across runs and engines.
  */
object Similarity {

  /** Codegen'd dense dot product (see [[graft.functions.VecDot]]); the
    * zip_with/aggregate formulation runs interpreted and is ~50x slower.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot.of(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Exact top-k: for each query vector (small set — broadcast), the k
    * nearest corpus vectors by cosine. Deterministic tie-break on corpus
    * id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        cosine(col("q_vec"), col("nn_vec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (seed, dim):
    * xxh64 of "seed:dim" scaled to [-1, 1].
    */
  private def planeComponent(seed: Int, dim: Int): Double = {
    val h = {
      // xxh64 via Spark expression would need a row; use the same 64-bit
      // mix inline (splitmix64) — deterministic, engine-independent
      var z = seed.toLong * 0x9E3779B97F4A7C15L + dim.toLong
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** nBits-bit random-hyperplane signature of a vector column. */
  def rhpSignature(vec: Column, dims: Int, nBits: Int): Column =
    array((0 until nBits).map { b =>
      val plane = array((0 until dims).map(d => lit(planeComponent(b, d))): _*)
      when(dot(vec.cast(ArrayType(DoubleType)), plane) >= 0, lit(1L)).otherwise(lit(0L))
    }: _*)

  /** Pack signature bits into band keys of `bandBits` each. */
  private def bandKeys(sig: Column, nBits: Int, bandBits: Int): Column =
    array((0 until nBits / bandBits).map { band =>
      aggregate(slice(sig, band * bandBits + 1, bandBits),
        lit(0L), (acc, b) => acc * 2 + b)
    }: _*)

  /** LSH top-k: candidates share at least one signature band with the
    * query; exact cosine re-rank inside the candidate set. Recall rises
    * with more/narrower bands; the exact path above is the oracle.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dims: Int,
      nBits: Int = 16, bandBits: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nBands = nBits / bandBits
    def withBands(df: DataFrame, idAs: String, vecAs: String) =
      df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
        posexplode(bandKeys(rhpSignature(col(vecCol), dims, nBits), nBits, bandBits))
          .as(Seq("band", "key")))

    val c = withBands(corpus, "nn_id", "nn_vec")
    val q = withBands(queries, "query_id", "q_vec")
    val candidates = c.join(broadcast(q),
        c("band") === q("band") && c("key") === q("key") &&
        col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"), col("q_vec"), col("nn_vec"))
      .dropDuplicates("query_id", "nn_id")
      .select(col("query_id"), col("nn_id"),
        cosine(col("q_vec"), col("nn_vec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-lite: centroids = deterministic sample of corpus vectors; each
    * corpus vector is assigned to its nearest centroid once (narrow scan
    * vs broadcast centroids); queries probe their `nprobe` nearest cells.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // deterministic "k-means-lite": take the nCells lowest-id vectors as
    // centroids (stable across runs; a real deployment would run sampled
    // k-means on the driver and broadcast)
    val centroids = corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).as("cell"), col(vecCol).as("c_vec"))

    def assign(df: DataFrame, idAs: String, vecAs: String, topCells: Int) = {
      val scored = df.select(col(idCol).as(idAs), col(vecCol).as(vecAs))
        .join(broadcast(centroids), col(idAs) =!= lit(-1))
        .select(col(idAs), col(vecAs), col("cell"),
          cosine(col(vecAs), col("c_vec")).as("c_cos"))
      val w = Window.partitionBy(col(idAs)).orderBy(col("c_cos").desc, col("cell"))
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") <= topCells)
        .drop("c_cos", "crank")
    }

    val c = assign(corpus, "nn_id", "nn_vec", 1)       // 1 cell per vector
    val q = assign(queries, "query_id", "q_vec", nprobe) // probe nprobe cells
    val scored = c.join(broadcast(q),
        c("cell") === q("cell") && col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        cosine(col("q_vec"), col("nn_vec")).as("cos"))
      .dropDuplicates("query_id", "nn_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs: cosine >= threshold among a bounded
    * query slice (exact) — the embedding-dedup entry in the dedup suite.
    */
  def embeddingNearDups(corpus: DataFrame, queries: DataFrame,
      threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("b"), col(vecCol).as("b_vec"))
    val q = queries.select(col(idCol).as("a"), col(vecCol).as("a_vec"))
    c.join(broadcast(q), col("a") < col("b"))
      .select(col("a"), col("b"), cosine(col("a_vec"), col("b_vec")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
