package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftSession, Tables}
import graft.functions.ChGetters.ParseOpts
import graft.parse.Projector
import graft.parse.Projector.Dim
import graft.types.ChType

object ProfileParse2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val events = Tables(spark, "/root/testdata/sf0.1").events
    val raw = events.select(to_json(struct(
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ssXXX").as("time"),
      col("event_type").as("name"), col("value").as("value"),
      col("value").as("price"), col("user_id").as("uid"),
      col("event_id").as("id"))).as("value")).repartition(32).persist()
    raw.count()
    def time(label: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val nativeSchema = StructType(Seq(
      StructField("time", TimestampType), StructField("name", StringType),
      StructField("value", DoubleType), StructField("price", DecimalType(9, 3)),
      StructField("uid", LongType), StructField("id", LongType)))
    val native = raw.select(from_json(col("value"), nativeSchema).as("m")).select(col("m.*"))
    time("native_from_json") { native.write.format("noop").mode("overwrite").save() }
    val dims = Seq(
      Dim("time", ChType.whichType("DateTime")),
      Dim("name", ChType.whichType("String")),
      Dim("value", ChType.whichType("Float64")),
      Dim("price", ChType.whichType("Decimal32(3)")),
      Dim("uid", ChType.whichType("UInt32")),
      Dim("id", ChType.whichType("Int64")))
    val projected = Projector.projectJson(raw, dims, ParseOpts())
    time("graft_project") { projected.write.format("noop").mode("overwrite").save() }
    val p = projected.queryExecution.executedPlan.toString
    println("codegen'd operators (* prefix): " + "\\*\\(".r.findAllIn(p).length)
    println(p.linesIterator.take(12).mkString("\n"))
    spark.stop()
  }
}
