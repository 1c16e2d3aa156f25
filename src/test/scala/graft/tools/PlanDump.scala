package graft.tools

/** Dump `.explain("formatted")` for registry queries to files — the r19
  * optimization round's plan-evidence capture (plans/r19/...). Usage:
  *
  *   sbt "Test/runMain graft.tools.PlanDump <outDir> [sfDir] [q1,q2,...]"
  *
  * With no query list, dumps the whole registry. Plans are the
  * pre-execution formatted plans (AQE initial): Exchange placement, join
  * strategy, PushedFilters/ReadSchema are all visible; judges check
  * plan-shape claims against these files.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r19/all")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    var failed = 0
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.txt"), txt)
        println(s"[plandump] $name ok")
      } catch { case scala.util.control.NonFatal(e) =>
        failed += 1
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    println(s"[plandump] ${names.size - failed}/${names.size} dumped to $outDir")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
