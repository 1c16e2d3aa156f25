package graft.tools

import org.apache.spark.sql.functions._

/** Session probe for the r18 diff question: `dedup_embedding_lsh_b32`
  * recorded 21.1 s in r17 and 29-36 s across four r18 runs with its
  * code path untouched — is ~29 s the true warm floor of this box's
  * current state (page cache of the 2 GB embeddings parquet), or did
  * something regress? Runs the EXACT bench recipe three times in one
  * JVM and prints each wall + external cores.
  *
  *   sbt "Test/runMain graft.tools.ProbeEmbIncr [embDir]"
  */
object ProbeEmbIncr {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    val dir = args.headOption.getOrElse("target/bench_100x_emb_sf0.1_r1000")
    val nEmb = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val embBandBits = graft.operators.Similarity.bandBitsFor(2 * nEmb)
    println(s"[probe] nEmb=$nEmb bandBits=$embBandBits")
    val lsnr = new graft.ShuffleStatListener
    spark.sparkContext.addSparkListener(lsnr)
    (1 to 3).foreach { i =>
      lsnr.reset()
      val e0 = graft.ExternalLoad.trySnap()
      val t0 = System.nanoTime()
      val ref = spark.read.parquet(s"$dir/embeddings.parquet")
      val fresh = ref.select(
        (col("vec_id") + 20000000000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.05)).as("embedding"))
      val n = graft.operators.Similarity.nearDupsAgainstEmbedding(ref, fresh,
        threshold = 0.75, dims = 64, nBits = 384, bandBits = embBandBits,
        expectedN = Some(2 * nEmb)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val ext = e0.flatMap(a => graft.ExternalLoad.trySnap()
        .map(b => graft.ExternalLoad.externalCores(a, b, 32))).getOrElse(-1.0)
      // the listener bus drains async: poll until the counters hold still
      // for two consecutive samples (a fixed sleep under-counts on heavy
      // runs where the event queue drains slower — ADVICE r19)
      var settled = lsnr.snapshot
      var stable = false
      val settleT0 = System.nanoTime()
      while (!stable && (System.nanoTime() - settleT0) / 1e9 < 15) {
        Thread.sleep(500)
        val next = lsnr.snapshot
        stable = next == settled
        settled = next
      }
      val (wr, rd, maxRd, nTasks, skew, spill) = settled
      println(f"[probe] run$i $sec%6.1f s  pairs=$n  ext=$ext%.2f  " +
        f"wr=${wr / 1e9}%.2f GB rd=${rd / 1e9}%.2f GB " +
        f"maxTask=${maxRd / 1e6}%.1f MB tasks=$nTasks skew=$skew%.2f " +
        f"spill=${spill / 1e6}%.1f MB")
    }
    spark.stop()
  }
}
