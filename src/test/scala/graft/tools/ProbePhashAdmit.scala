package graft.tools

import org.apache.spark.sql.functions._

/** Session probe for the r19 task-2 attribution: `stream_phash_admit_1m`
  * recorded 1.93 s (r17) -> 5.87 s (r18) with IDENTICAL shuffle bytes
  * (11,130,659) at quiet recorded ext — same code path both rounds, so
  * the cost moved into something the shuffle telemetry cannot see
  * (driver FS work, job scheduling, state-scan IO, checkpoint writes).
  * This probe replays the bench recipe exactly (1M standing
  * fingerprints, 5% in ~1000-member hot cliques; admit 100K fresh at
  * replay-idempotent batch id 1) and decomposes each admit into its
  * Spark JOBS via listener timestamps: per-job wall, plus the gaps
  * between jobs = driver-side work (state dir listing, lease/params
  * IO, parquet footer reads). Run twice warm like the bench's
  * min-of-2.
  *
  *   sbt "Test/runMain graft.tools.ProbePhashAdmit [nRuns]"
  */
object ProbePhashAdmit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.conf.set("spark.sql.shuffle.partitions", "512") // the 100x tier's
    val nRuns = args.headOption.map(_.toInt).getOrElse(3)
    val stateDir = "target/probe_phash_admit_state"

    def rmState(): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      val f = new java.io.File(stateDir)
      if (f.exists()) rm(f)
    }
    rmState()

    def phashCorpus(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id").as("asset_id"),
      when(pmod(col("id"), lit(20L)) === 0,
          xxhash64(pmod(col("id"), lit(1000L))))
        .otherwise(xxhash64(col("id"), lit(99L))).as("fp"))

    val spd = new graft.streaming.StreamingPhashDedup(spark, stateDir,
      "asset_id", "fp")
    val t0s = System.nanoTime()
    spd.seed(phashCorpus(spark.range(1000000L).toDF("id")))
    println(f"[probe] seed ${(System.nanoTime() - t0s) / 1e9}%6.2f s")

    // per-job wall + inter-job driver gaps, in submission order
    final case class J(id: Int, t0: Long, var t1: Long, desc: String)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[J]
    val byId = new java.util.concurrent.ConcurrentHashMap[Integer, J]
    val lsnr = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val j = J(e.jobId, System.nanoTime(), -1L,
          Option(e.properties.getProperty("spark.job.description"))
            .orElse(Option(e.properties.getProperty("callSite.short")))
            .getOrElse("?").take(70))
        jobs.add(j); byId.put(e.jobId, j)
      }
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val j = byId.get(e.jobId)
        if (j != null) j.t1 = System.nanoTime()
      }
    }
    spark.sparkContext.addSparkListener(lsnr)
    val shuf = new graft.ShuffleStatListener
    spark.sparkContext.addSparkListener(shuf)

    val batch = phashCorpus(spark.range(1000000L, 1100000L).toDF("id"))
    (1 to nRuns).foreach { i =>
      jobs.clear(); byId.clear(); shuf.reset()
      val t0 = System.nanoTime()
      val n = spd.admit(batch, 1L).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_.t0)
      var prev = t0
      println(f"[probe] admit$i wall=$wall%6.2f s  pairs=$n")
      js.foreach { j =>
        val gap = (j.t0 - prev) / 1e9
        val dur = if (j.t1 < 0) -1.0 else (j.t1 - j.t0) / 1e9
        println(f"[probe]   gap=$gap%6.3f s | job ${j.id}%3d $dur%7.3f s  ${j.desc}")
        prev = math.max(prev, if (j.t1 < 0) j.t0 else j.t1)
      }
      println(f"[probe]   tail-gap=${(t0 + (wall * 1e9).toLong - prev) / 1e9}%6.3f s" +
        f"  (driver work after the last job)")
      val (wr, rd, _, _, _, spill) = shuf.snapshot
      println(f"[probe]   shuffle wr=${wr / 1e6}%.2f MB rd=${rd / 1e6}%.2f MB" +
        f" spill=${spill / 1e6}%.2f MB")
    }
    rmState()
    spark.stop()
  }
}
