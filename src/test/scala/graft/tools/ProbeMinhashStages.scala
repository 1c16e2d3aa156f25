package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}

/** Session probe for the flagship-row hunts (r17 origin, r20 upgrade):
  * runs a registry query over the cached 5M-doc corpus N times in one
  * JVM — clearing every cached plan/persisted RDD between runs, the
  * bench's own no-cross-run-reuse protocol — and dumps, for the LAST
  * (JIT-warm) run, per-stage wall / shuffle bytes WITH the owning job id
  * (pin-count jobs vs the result job attribute cleanly), plus per-run
  * wall / external cores / PSI IO-stall fraction so a weather-degraded
  * run is visible instead of suspected.
  *
  *   sbt "Test/runMain graft.tools.ProbeMinhashStages [corpusDir] [query] [runs] [parts]"
  */
object ProbeMinhashStages {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    // default matches the bench 100x tier (cpus*16); pass the session
    // default (32) when probing 1x-tier rows
    spark.conf.set("spark.sql.shuffle.partitions",
      args.lift(3).getOrElse("512"))
    val dir = args.headOption.getOrElse("target/bench_100x_v2_sf0.1_r1000")
    val query = args.lift(1).getOrElse("dedup_minhash_lsh")
    val nRuns = args.lift(2).map(_.toInt).getOrElse(2)

    final case class St(id: Int, job: Int, name: String, sec: Double,
      read: Long, write: Long, input: Long, tasks: Int)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]
    val lsnr = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        j.stageIds.foreach(s => stageJob.put(s, j.jobId))
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val sec = (for {a <- i.completionTime; b <- i.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        stages.add(St(i.stageId, stageJob.getOrDefault(i.stageId, -1),
          i.name.takeWhile(_ != '\n').take(90), sec,
          m.shuffleReadMetrics.localBytesRead +
            m.shuffleReadMetrics.remoteBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead,
          i.numTasks))
        ()
      }
    }
    var df: org.apache.spark.sql.DataFrame = null
    (1 to nRuns).foreach { r =>
      // only the last run's stages feed the table below
      if (r == nRuns) spark.sparkContext.addSparkListener(lsnr)
      val la = graft.ExternalLoad.trySnap()
      val io0 = graft.IoPressure.totalStallUs()
      val t0 = System.nanoTime()
      df = graft.SparkEntry.queries(query)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val ext = la.flatMap(a => graft.ExternalLoad.trySnap()
        .map(b => graft.ExternalLoad.externalCores(a, b, 32))).getOrElse(-1.0)
      val io = graft.IoPressure.stallFrac(io0,
        graft.IoPressure.totalStallUs(), sec)
      println(f"[probe] run$r $sec%7.1f s  ext=$ext%.2f io=$io%.3f")
      // bench no-reuse protocol: every run computes from parquet
      if (r < nRuns) {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    // final AQE plan with materialized query-stage ids, for attributing
    // the per-stage rows below to plan operators
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("QueryStage") ||
        l.contains("Join") || l.contains("Generate") || l.contains("Scan") ||
        l.contains("HashAggregate") || l.contains("Project"))
      .foreach(l => println("[plan] " + l.take(180)))
    Thread.sleep(3000)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_.sec).take(24).foreach { s =>
      println(f"[probe] stage ${s.id}%4d job ${s.job}%3d ${s.sec}%7.1f s  " +
        f"in=${s.input / 1e9}%6.2f GB  rd=${s.read / 1e9}%6.2f GB  " +
        f"wr=${s.write / 1e9}%6.2f GB  tasks=${s.tasks}%4d  ${s.name}")
    }
    spark.stop()
  }
}
