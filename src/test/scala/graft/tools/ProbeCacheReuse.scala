package graft.tools

import org.apache.spark.sql.functions._

/** r20 measurement-integrity probe: does the pinned minhash pair result
  * (persisted, never unpersisted by the registry queries) survive in the
  * session CacheManager and get silently REUSED by the next
  * canonically-equal run — i.e. accidental cross-run result caching in
  * the bench? Runs the flagship pair operator three times back-to-back
  * on one session (the bench's min-of-N shape) with the pin forced on,
  * then once more after an explicit cache clear, printing wall + the
  * CacheManager/persistent-RDD population. If run2/run3 are far below
  * run1 while the post-clear run matches run1, the reuse is real.
  *
  *   sbt "Test/runMain graft.tools.ProbeCacheReuse [sfDir]"
  */
object ProbeCacheReuse {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(16)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d = graft.Tables(spark, dir).documents

    def corpus = d.select(col("doc_id"), col("text"))
      .union(d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))

    def once(label: String): Unit = {
      val t0 = System.nanoTime()
      val p = graft.operators.Dedup.nearDupPairsMinhash(corpus,
        "doc_id", "text", n = 3, bands = 8, rows = 4, threshold = 0.9,
        pinMinBytes = 1L)
      val n = p.count()
      println(f"[cache-reuse] $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
        f"  pairs=$n  persistentRDDs=${spark.sparkContext.getPersistentRDDs.size}" +
        s"  cacheEmpty=${spark.sharedState.cacheManager.isEmpty}")
    }

    once("run1"); once("run2"); once("run3")
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    once("post-clear")
    spark.stop()
  }
}
