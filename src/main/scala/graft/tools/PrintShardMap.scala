package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev helper: print the Go-parity xxh64 shard of each events.event_type
  * (pins the q_shard_hash golden oracle; asserted in GoHashSpec).
  */
object PrintShardMap {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._
    val df = Seq("click", "error", "purchase", "signup", "view").toDF("et")
    df.select(col("et"), graft.functions.GoHash.goXxHash64(col("et")).as("h"),
        graft.functions.GoHash.unsignedMod(
          graft.functions.GoHash.goXxHash64(col("et")), 8).as("shard8"))
      .collect().foreach(r => println(s"MAP ${r.getString(0)} ${r.getLong(1)} ${r.getInt(2)}"))
    spark.stop()
  }
}
