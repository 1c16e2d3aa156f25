package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Session probe for the r17 flagship-row hunt: runs the exact 100x
  * `dedup_minhash_lsh` registry job over the cached 5M-doc corpus and
  * dumps per-stage wall / shuffle bytes, to locate where the ~131 s
  * goes (signature scan vs band exchange vs candidate distinct vs the
  * verify joins that move shingle arrays).
  *
  *   sbt "Test/runMain graft.tools.ProbeMinhashStages [corpusDir] [query]"
  */
object ProbeMinhashStages {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    val dir = args.headOption.getOrElse("target/bench_100x_v2_sf0.1_r1000")
    val query = args.lift(1).getOrElse("dedup_minhash_lsh")

    final case class St(id: Int, name: String, sec: Double, read: Long,
      write: Long, input: Long, tasks: Int)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]
    val lsnr = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val sec = (for {a <- i.completionTime; b <- i.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        stages.add(St(i.stageId, i.name.takeWhile(_ != '\n').take(90), sec,
          m.shuffleReadMetrics.localBytesRead +
            m.shuffleReadMetrics.remoteBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead,
          i.numTasks))
        ()
      }
    }
    spark.sparkContext.addSparkListener(lsnr)
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(query)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println(f"[probe] total ${(System.nanoTime() - t0) / 1e9}%.1f s")
    // final AQE plan with materialized query-stage ids, for attributing
    // the per-stage rows below to plan operators
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("QueryStage") ||
        l.contains("Join") || l.contains("Generate") || l.contains("Scan") ||
        l.contains("HashAggregate") || l.contains("Project"))
      .foreach(l => println("[plan] " + l.take(180)))
    Thread.sleep(3000)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_.sec).take(20).foreach { s =>
      println(f"[probe] stage ${s.id}%4d ${s.sec}%7.1f s  " +
        f"in=${s.input / 1e9}%6.2f GB  rd=${s.read / 1e9}%6.2f GB  " +
        f"wr=${s.write / 1e9}%6.2f GB  tasks=${s.tasks}%4d  ${s.name}")
    }
    spark.stop()
  }
}
