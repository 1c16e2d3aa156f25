package graft.tools

import org.apache.spark.sql.functions._

/** Session probe for the r16 task "StreamingPhashDedup collapse knob":
  * re-runs the r15 1M-standing-fingerprint hot-clique probe (5% of
  * fingerprints in ~1000-member cliques) through the collapse-first
  * DEFAULT — admission output must now be clique-sized (one
  * representative pair per distinct state fingerprint), not the 5-6M
  * raw pairs r15 measured.
  *
  *   sbt "Test/runMain graft.tools.ProbePhashStream"
  */
object ProbePhashStream {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val nState = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nBatch = 100000L

    // 5% of rows collapse into ~50 hot cliques of ~1000 members; the
    // rest are unique hash-derived fingerprints — the r15 probe recipe
    def corpus(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id").as("asset_id"),
      when(pmod(col("id"), lit(20L)) === 0,
          xxhash64(pmod(col("id"), lit(1000L))))
        .otherwise(xxhash64(col("id"), lit(99L))).as("fp"))

    val stateDir = s"/tmp/probe_phash_stream_$nState"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
    val spd = new graft.streaming.StreamingPhashDedup(spark, stateDir,
      "asset_id", "fp")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-10s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    timed("seed") { spd.seed(corpus(spark.range(nState).toDF("id"))) }
    (0 until 3).foreach { k =>
      val batch = corpus(spark.range(
        nState + k * nBatch, nState + (k + 1) * nBatch).toDF("id"))
      val pairs = timed(s"admit$k") { spd.admit(batch, k.toLong) }
      val np = pairs.count()
      val hot = pairs.agg(max(col("clique_ref")), max(col("clique_new")))
        .head()
      println(s"[probe] admit$k pairs=$np maxCliqueRef=${hot.get(0)} " +
        s"maxCliqueNew=${hot.get(1)}")
    }
    timed("compact") { spd.compact(upTo = 1L) }
    spark.stop()
  }
}
