package graft.tools

import org.apache.spark.sql.functions._

/** Session probe for the r16 task "materialize pageRank's loop
  * invariants": runs the exact Bench 100x `graph_pagerank` job (5
  * hash-derived out-edges per doc over the cached 5M-doc corpus, 25M
  * edges) and reports wall + shuffle telemetry, to set the r15 142.7 s
  * artifact row against the invariant-pinned loop.
  *
  *   sbt "Test/runMain graft.tools.ProbePageRank [corpusDir]"
  */
object ProbePageRank {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    val dir = args.headOption
      .getOrElse("target/bench_100x_v2_sf0.1_r1000")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
    val nDocs = docs.count()
    val edges = docs.select(col("doc_id").as("src"),
      explode(array((0 until 5).map(i =>
        pmod(xxhash64(col("doc_id"), lit(i)),
          lit(nDocs * 2))): _*)).as("dst"))
    (1 to 2).foreach { run =>
      val t0 = System.nanoTime()
      val n = graft.operators.Graph.pageRank(edges).count()
      println(f"[probe] run$run pageRank over ${nDocs * 5} edges: " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s ($n ranked nodes)")
    }
    spark.stop()
  }
}
