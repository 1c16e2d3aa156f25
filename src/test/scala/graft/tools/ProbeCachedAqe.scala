package graft.tools

import org.apache.spark.sql.functions._

/** One-session check: does Spark 4.1 run AQE (incl. skew-join splits)
  * INSIDE an InMemoryRelation's cached plan? Decides whether pinning
  * the minhash candidate table keeps the band self-join's skew
  * handling.
  *
  *   sbt "Test/runMain graft.tools.ProbeCachedAqe"
  */
object ProbeCachedAqe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    println("[probe] canChangeCachedPlanOutputPartitioning = " +
      spark.conf.getOption(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    import spark.implicits._
    val skewed = spark.range(200000)
      .select((col("id") % 10000).as("k"), col("id").as("v"))
      .union(spark.range(300000).select(lit(1L).as("k"), col("id").as("v")))
    val j = skewed.as("a").join(skewed.as("b"), "k")
      .groupBy(col("a.v")).agg(count(lit(1)).as("n"))
      .persist()
    j.count()
    val consumer = j.agg(sum(col("n"))).collect()
    println("[probe] sum=" + consumer.mkString)
    println("[probe] pinned df plan after count:\n" +
      j.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
