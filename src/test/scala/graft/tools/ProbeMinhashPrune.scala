package graft.tools

import org.apache.spark.sql.functions._

/** r20 A/B of the minhash verify-prune strategies on the LOW-DUP 5M-doc
  * corpus — the real-world case the broadcast prune exists for (the
  * graded r1000 corpus gives every doc an exact twin, so the prune
  * keeps ~100% there and the byte win is nil by construction). Runs the
  * pinned operator with `broadcastIdsMaxPairs = 0` (the legacy SMJ
  * semi-join shape, byte-for-byte) and with the default gate
  * (broadcast + pruned repartition), N runs each with the bench's
  * cache-clear protocol, reporting wall / ext / PSI-io / shuffle bytes.
  *
  *   sbt "Test/runMain graft.tools.ProbeMinhashPrune [corpusDir] [runs]"
  */
object ProbeMinhashPrune {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    val dir = args.headOption
      .getOrElse("target/bench_100x_v2_sf0.1_r1000_lowdup")
    val nRuns = args.lift(1).map(_.toInt).getOrElse(2)
    val lsnr = new graft.ShuffleStatListener
    spark.sparkContext.addSparkListener(lsnr)
    // the corpus is the low-dup documents ALONE — the registry queries'
    // exact-twin union (d ∪ d+offset) hands every doc a duplicate, which
    // makes any id-prune vacuous; this probe exists to measure the
    // genuinely-low-dup case the prune is built for
    def corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def once(label: String, cap: Long): Unit = {
      lsnr.reset()
      val e0 = graft.ExternalLoad.trySnap()
      val io0 = graft.IoPressure.totalStallUs()
      val t0 = System.nanoTime()
      val p = graft.operators.Dedup.nearDupPairsMinhash(corpus,
        "doc_id", "text", n = 3, bands = 8, rows = 4, threshold = 0.9,
        broadcastIdsMaxPairs = cap)
      val n = p.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val ext = e0.flatMap(a => graft.ExternalLoad.trySnap()
        .map(b => graft.ExternalLoad.externalCores(a, b, 32))).getOrElse(-1.0)
      val io = graft.IoPressure.stallFrac(io0,
        graft.IoPressure.totalStallUs(), sec)
      Thread.sleep(2000)
      val (wr, rd, _, _, _, spill) = lsnr.snapshot
      println(f"[prune] $label%-10s $sec%7.1f s  pairs=$n  ext=$ext%.2f " +
        f"io=$io%.3f  wr=${wr / 1e9}%.2f GB rd=${rd / 1e9}%.2f GB " +
        f"spill=${spill / 1e9}%.2f GB")
      p.unpersist()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    (1 to nRuns).foreach { r =>
      once(s"smj-$r", 0L)
      once(s"bcast-$r", Long.MaxValue)
    }
    spark.stop()
  }
}
