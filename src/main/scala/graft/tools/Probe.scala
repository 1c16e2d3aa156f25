package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    val js = Seq("""{"a":1,"b":123.321,"c":"x","d":true,"e":null,"f":[1,2],"g":{"k":1,"s":"v"},"h":18446744073709551615,"i":18446744073709551616,"j":9223372036854775807,"k":1e3,"l":-9223372036854775809}""").toDF("raw")
    val v = try_parse_json($"raw")
    def sv(p: String) = schema_of_variant(try_variant_get(v, p, "variant"))
    js.select(
      sv("$.a").as("a"), sv("$.b").as("b"), sv("$.c").as("c"), sv("$.d").as("d"),
      sv("$.e").as("e"), sv("$.f").as("f"), sv("$.g").as("g"), sv("$.h").as("h"),
      sv("$.i").as("i"), sv("$.j").as("j"), sv("$.k").as("k"), sv("$.l").as("l"),
      sv("$.zz").as("missing")
    ).show(false)
    js.select(
      try_variant_get(v, "$.g", "map<string,variant>").as("m"),
      to_json(try_variant_get(v, "$.g", "variant")).as("gjson"),
      try_variant_get(v, "$.h", "decimal(38,0)").as("hdec"),
      try_variant_get(v, "$.b", "decimal(38,0)").as("bdec"),
      try_variant_get(v, "$.d", "string").as("dstr"),
      is_variant_null(try_variant_get(v, "$.e", "variant")).as("enull"),
      try_variant_get(v, "$.f", "array<variant>").as("farr")
    ).show(false)
  }
}
