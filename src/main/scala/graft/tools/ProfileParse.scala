package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftSession, Tables}
import graft.functions.ChGetters
import graft.functions.ChGetters.ParseOpts
import graft.parse.Projector
import graft.parse.Projector.Dim
import graft.types.ChType

object ProfileParse {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val events = Tables(spark, "/root/testdata/sf0.1").events
    val raw = events.select(to_json(struct(
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ssXXX").as("time"),
      col("event_type").as("name"), col("value").as("value"),
      col("value").as("price"), col("user_id").as("uid"),
      col("event_id").as("id"))).as("value")).persist()
    raw.count()
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("baseline_count") { raw.write.format("noop").mode("overwrite").save() }
    time("parse_json_only") {
      raw.select(parse_json(col("value")).as("v")).write.format("noop").mode("overwrite").save()
    }
    time("parse_plus_1field") {
      val m = ChGetters.parsed(col("value"))
      raw.select(ChGetters.getSigned(ChGetters.field(m, "id"), false, LongType).as("x"))
        .write.format("noop").mode("overwrite").save()
    }
    val dims = Seq(
      Dim("time", ChType.whichType("DateTime")),
      Dim("name", ChType.whichType("String")),
      Dim("value", ChType.whichType("Float64")),
      Dim("price", ChType.whichType("Decimal32(3)")),
      Dim("uid", ChType.whichType("UInt32")),
      Dim("id", ChType.whichType("Int64")))
    val projected = Projector.projectJson(raw, dims, ParseOpts())
    time("full_project_6dims") {
      projected.write.format("noop").mode("overwrite").save()
    }
    // how many parse_jsons survive in the optimized plan?
    val plan = projected.queryExecution.executedPlan.toString
    println("parse_json occurrences in physical plan: " +
      "parse_json".r.findAllIn(plan.toLowerCase).length)
    println("variant_get occurrences: " + "variant_get".r.findAllIn(plan.toLowerCase).length)
    println("WholeStageCodegen spans: " + "wholestagecodegen".r.findAllIn(plan.toLowerCase).length)
    spark.stop()
  }
}
