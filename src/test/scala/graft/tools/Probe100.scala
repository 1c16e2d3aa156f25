package graft.tools

/** Scratch probe for the 100x corpus shape (deleted after use). */
object Probe100 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(16)
    val dir = graft.BenchScale100.ensure(spark, "/root/testdata/sf0.001", 16, 20)
    val t0 = System.nanoTime()
    val pairs = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
    val n = pairs.count()
    println(f"[probe] lsh pairs=$n%d in ${(System.nanoTime()-t0)/1e9}%.1f s")
    import org.apache.spark.sql.functions._
    pairs.groupBy(when(col("jaccard") === 1.0, "exact").otherwise("near").as("kind"))
      .count().show()
    spark.stop()
  }
}
