package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.GraftSession
import graft.functions.ChGetters
object ProbeCodegen {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    val df = Seq("""{"a":1,"b":"x"}""").toDF("value")
    def spans(d: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val p = d.queryExecution.executedPlan.toString
      println(s"$label -> WSCG spans: " + "WholeStageCodegen".r.findAllIn(p).length)
    }
    spans(df.select(col("value").substr(1, 3)), "plain substr")
    spans(df.select(parse_json(col("value")).as("v")), "parse_json")
    spans(df.select(try_parse_json(col("value")).as("v")), "try_parse_json")
    val v = parse_json(col("value"))
    spans(df.select(try_variant_get(v, "$.a", "variant").as("f")), "variant_get")
    spans(df.select(schema_of_variant(try_variant_get(v, "$.a", "variant")).as("t")), "schema_of_variant")
    spans(df.select(try_variant_get(v, "$.a", "decimal(38,0)").as("d")), "vget decimal")
    spans(df.select(ChGetters.autoTimestamp(col("value"), "UTC")), "auto_timestamp")
    spans(df.select(is_variant_null(try_variant_get(v, "$.a", "variant"))), "is_variant_null")
    spark.stop()
  }
}
