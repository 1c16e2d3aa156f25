package graft.tools

import org.apache.spark.sql.functions._

/** Session probe for the r16 winnow 100x row sizing: runs
  * `substringDupPairsWinnowed` over the cached 5M-doc low-dup corpus at
  * the given shuffle-partition / advisory-size combo and reports wall +
  * shuffle + SPILL (the Bench ShuffleStatListener fields) — used to
  * pick the per-row sizing that keeps the 48 GB banding payload
  * memory-resident (64 MB tasks measured 14.7 GB of spill).
  *
  *   sbt "Test/runMain graft.tools.ProbeWinnow [parts] [advisory]"
  */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val parts = args.headOption.getOrElse("2048")
    val advisory = args.drop(1).headOption.getOrElse("16m")
    val split = args.drop(2).headOption.getOrElse("4m")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
    spark.conf.set("spark.sql.files.maxPartitionBytes", split)
    val lsnr = new graft.ShuffleStatListener
    spark.sparkContext.addSparkListener(lsnr)
    val docs = spark.read
      .parquet("target/bench_100x_v2_sf0.1_r1000_lowdup/documents.parquet")
      .select(col("doc_id"), col("text"))
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup
      .substringDupPairsWinnowed(docs, "doc_id", "text", k = 40, w = 10)
      .count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000)
    val (w, r, maxR, tasks, skew, spill) = lsnr.snapshot
    println(f"[probe] winnow parts=$parts advisory=$advisory: $sec%.1f s, " +
      f"$n pairs, write ${w / 1e9}%.1f GB, read ${r / 1e9}%.1f GB, " +
      f"maxTask ${maxR / 1e6}%.0f MB, tasks $tasks, skew $skew%.2f, " +
      f"SPILL ${spill / 1e9}%.2f GB")
    spark.stop()
  }
}
