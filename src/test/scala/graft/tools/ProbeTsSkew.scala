package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Session probe for the r18 task-7 question: `timeseries_chain`'s 100x
  * row carries the tier's highest task skew (skew_max_over_mean 9.34 on
  * 545 read tasks, stable across rounds) — is one bucket key hot, or is
  * it the structural resample boundary? Runs the exact bench job over
  * the cached 10M-event corpus and dumps PER-STAGE task shuffle-read
  * max/mean/p50 and wall, so the skewed stage (and whether its skew is
  * data or partitioning) is named.
  *
  *   sbt "Test/runMain graft.tools.ProbeTsSkew [eventsDir]"
  */
object ProbeTsSkew {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    val dir = args.headOption.getOrElse("target/bench_100x_ev_sf0.1_r100")

    final case class T(read: Long, durMs: Long)
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int,
      java.util.concurrent.ConcurrentLinkedQueue[T]]
    val names = new java.util.concurrent.ConcurrentHashMap[Int, (String, Double)]
    val lsnr = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.localBytesRead +
            m.shuffleReadMetrics.remoteBytesRead
          byStage.computeIfAbsent(te.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[T])
            .add(T(r, te.taskInfo.duration))
          ()
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val sec = (for {a <- i.completionTime; b <- i.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        names.put(i.stageId, (i.name.takeWhile(_ != '\n').take(70), sec))
        ()
      }
    }
    spark.sparkContext.addSparkListener(lsnr)
    // optional second arg: profile a registry query on `dir` instead of
    // the timeseries chain (same per-stage task dump)
    val out = args.lift(1) match {
      case Some(q) => graft.SparkEntry.queries(q)(spark, dir)
      case None =>
        val ev = spark.read.parquet(s"$dir/events.parquet")
        val rs = graft.operators.TimeSeries.resample(
          ev, Seq("user_id"), "ts", 3600, col("value"))
        val lo = graft.operators.TimeSeries.locf(rs, Seq("user_id"), "b", "v0")
        graft.operators.TimeSeries.movingAvg(lo, Seq("user_id"), "b", "v0", 6)
    }
    val t0 = System.nanoTime()
    out.write.format("noop").mode("overwrite").save()
    println(f"[probe] total ${(System.nanoTime() - t0) / 1e9}%.1f s")
    Thread.sleep(3000)
    import scala.jdk.CollectionConverters._
    byStage.asScala.toSeq.sortBy(_._1).foreach { case (sid, q) =>
      val ts = q.asScala.toSeq
      val reads = ts.map(_.read).sorted
      val durs = ts.map(_.durMs).sorted
      if (reads.nonEmpty) {
        val mean = reads.sum.toDouble / reads.length
        val (nm, sec) = Option(names.get(sid)).getOrElse(("?", -1.0))
        println(f"[probe] stage $sid%4d ${sec}%6.1f s tasks=${ts.length}%4d  " +
          f"read max=${reads.last / 1e6}%8.1f MB p50=${reads(reads.length / 2) / 1e6}%8.1f MB " +
          f"skew=${if (mean > 0) reads.last / mean else 0.0}%5.2f  " +
          f"dur max=${durs.last / 1e3}%6.1f s p50=${durs(durs.length / 2) / 1e3}%5.1f s  $nm")
      }
    }
    spark.stop()
  }
}
