package graft.tools

import org.apache.spark.sql.functions._

/** Session probe for the r18 task-1 measurement: standing minhash
  * admission cost at 1M standing docs, before/after the shingle-state
  * layout moves from STRING arrays to 64-bit fingerprints. Seeds 1M
  * docs from the cached 100x corpus into a throwaway state dir, then
  * times `admit()` of a 100K batch (half exact twins, half perturbed —
  * candidates are real) twice (the second run is the IO-warm number).
  * Reports wall per phase, on-disk state bytes, and shuffle bytes of
  * the admit run.
  *
  *   sbt "Test/runMain graft.tools.ProbeMinhashAdmit [corpusDir]"
  */
object ProbeMinhashAdmit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    val dir = args.headOption.getOrElse("target/bench_100x_v2_sf0.1_r1000")
    val stateDir = "target/probe_minhash_admit_state"

    def rmState(): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      val f = new java.io.File(stateDir)
      if (f.exists()) rm(f)
    }
    rmState()

    def stateBytes(): Long = {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(stateDir)
      if (!java.nio.file.Files.exists(p)) 0L
      else java.nio.file.Files.walk(p).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size).sum
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val standing = docs.limit(1000000)
    // batch: 100K docs, half exact twins of standing docs, half with a
    // perturbing suffix — same recipe as the stream_dedup_replay oracle
    val batch = docs.limit(100000).select(
      (col("doc_id") + 900000000L).as("doc_id"),
      when(col("doc_id") % 2 === 0, col("text"))
        .otherwise(concat(col("text"), lit(" zzprobe zzadmit"))).as("text"))

    val sd = new graft.streaming.StreamingDedup(spark, stateDir,
      "doc_id", "text", n = 3, bands = 8, rows = 4, threshold = 0.7)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-10s ${(System.nanoTime() - t0) / 1e9}%7.1f s" +
        f"  state=${stateBytes() / 1e9}%.2f GB")
      r
    }
    timed("seed")(sd.seed(standing))
    val lsnr = new graft.ShuffleStatListener
    spark.sparkContext.addSparkListener(lsnr)
    (1 to 2).foreach { i =>
      lsnr.reset()
      // BOTH runs re-admit batch id 1 (replay-idempotent: reads seed
      // only, overwrites its own delta) so the warm run measures the
      // SAME workload — batch id 2 would verify against 1.1M standing
      // docs including run 1's near-copies, conflating IO warmth with
      // state growth
      val n = timed(s"admit$i")(sd.admit(batch, 1L).count())
      Thread.sleep(2000)
      val (wr, rd, _, _, _, spill) = lsnr.snapshot
      println(f"[probe]   pairs=$n  shuffle wr=${wr / 1e9}%.2f GB " +
        f"rd=${rd / 1e9}%.2f GB  spill=${spill / 1e9}%.2f GB")
    }
    rmState()
    spark.stop()
  }
}
