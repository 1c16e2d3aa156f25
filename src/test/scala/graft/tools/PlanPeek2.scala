package graft.tools
object PlanPeek2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    val dir = "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
