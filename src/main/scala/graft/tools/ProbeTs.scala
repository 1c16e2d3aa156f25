package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions.ChGetters
object ProbeTs {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    val path = "/tmp/probe_ts_parquet"
    Seq("2024-01-01 00:00:07", "2024-01-02 10:20:30", "2024-01-01").toDF("s")
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    val out = df.select(col("s"), ChGetters.autoTimestamp(col("s"), "UTC").as("t"))
    out.show(false)
    println(out.queryExecution.executedPlan.toString.linesIterator.take(4).mkString("\n"))
    spark.stop()
  }
}
