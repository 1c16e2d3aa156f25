package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Scratch probe (session-only, deleted after use): PQ/ADC top-k at 2M
  * vectors — train, query, recall vs exact brute force.
  */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val e = spark.read.parquet(
        "target/bench_100x_emb_sf0.1_r1000/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
    val q = e.filter(col("vec_id") < 100)
    val gt = Similarity.bruteForceTopK(e, q, k = 10)
      .select(col("query_id"), col("nn_id")).cache()
    val tot = gt.count()
    val t0 = System.nanoTime()
    val books = Similarity.trainPq(e, m = 8, k = 256)
    println(f"PROBEPQ train m=8 k=256 wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    for (rr <- Seq(8, 32)) {
      val t1 = System.nanoTime()
      val pq = Similarity.pqTopKWithBooks(e, q, k = 10, books, rerank = rr)
        .cache()
      val n = pq.count()
      val sec = (System.nanoTime() - t1) / 1e9
      val hit = pq.select(col("query_id"), col("nn_id"))
        .join(gt, Seq("query_id", "nn_id"), "left_semi").count()
      println(f"PROBEPQ query rerank=$rr wall=$sec%.1f s rows=$n " +
        f"recall@10=${hit.toDouble / tot}%.4f")
      pq.unpersist()
    }
    spark.stop()
  }
}
