package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.GraftSession
object ProbeVariantField {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(2)
    import spark.implicits._
    val df = Seq("""{"a":123,"b":"123","big":{"x":[1,2,3]},"c":1.5}""").toDF("value")
    try {
      val schema = StructType(Seq(StructField("a", VariantType), StructField("b", VariantType)))
      val out = df.select(from_json(col("value"), schema).as("m"))
        .select(schema_of_variant(col("m.a")).as("ta"), schema_of_variant(col("m.b")).as("tb"))
      out.show(false)
    } catch { case e: Throwable => println("VARIANT FIELD UNSUPPORTED: " + e.getMessage.take(200)) }
    spark.stop()
  }
}
