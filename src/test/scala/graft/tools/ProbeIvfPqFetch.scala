package graft.tools

import org.apache.spark.sql.functions._

/** Session probe for the r16 task "IVFADC re-rank fetch shape, measured":
  * the r15 BENCHNOTES noted ivfPqTopK's residual wall is the
  * candidate-vector fetch riding the probed-cell scan; this probe runs
  * the 2M x 512 clustered corpus (the r15 recipe: 4096 deterministic
  * clusters + 5% noise; nCells=256, nprobe=16, m=8, k=16, rerank=8, 100
  * queries, k=10) through BOTH fetch shapes — the default probed-cell
  * join and the candidate-id point fetch (id-sorted cell files +
  * isin pushdown) — and prints both walls plus a result-identity check.
  *
  *   sbt "Test/runMain graft.tools.ProbeIvfPqFetch"
  *
  * Numbers land in BENCHNOTES; the losing shape stays documented on the
  * `pointFetch` parameter.
  */
object ProbeIvfPqFetch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    import graft.operators.Similarity
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val dims = 512
    val dir = s"/tmp/probe_ivfpq_fetch_$n"
    val marker = new java.io.File(s"$dir/_READY")

    // clustered corpus: 4096 hash-derived cluster centers, each vector =
    // its cluster's center + 5%-scale hash noise — deterministic, no RNG
    def vecs(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), d => {
        val cl = pmod(col("id"), lit(4096L))
        val center = (pmod(xxhash64(cl, d), lit(2001L)).cast("double")
          - 1000.0) / 1000.0
        val noise = (pmod(xxhash64(col("id"), d, lit(7L)), lit(2001L))
          .cast("double") - 1000.0) / 1000.0 * 0.05
        center + noise
      }).as("embedding"))

    if (!marker.exists()) {
      val corpus = vecs(spark.range(n).toDF("id"))
      val t0 = System.nanoTime()
      val cent = Similarity.trainCentroids(corpus, 256)
      val books = Similarity.trainPq(corpus, m = 8, k = 16)
      Similarity.IvfPqIndex.save(corpus, cent, books, dir)
      println(f"[probe] index built+saved in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      marker.createNewFile()
    }
    val queries = vecs(spark.range(100).select((col("id") * 19993L + 11L)
      .as("id")))
      .localCheckpoint()

    def run(name: String, pf: Boolean): (Double, Array[(Long, Long)]) = {
      val t0 = System.nanoTime()
      val out = Similarity.ivfPqTopK(spark, dir, queries, k = 10,
        nprobe = 16, rerank = 8, pointFetch = pf)
        .select("query_id", "nn_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-12s ${sec}%.1f s, ${out.length} result rows")
      (sec, out)
    }
    // warm the page cache / JIT once with the default shape, then
    // alternate to keep cache states comparable
    run("warmup", pf = false)
    val (sJoin1, rJoin) = run("join-fetch", pf = false)
    val (sPoint1, rPoint) = run("point-fetch", pf = true)
    val (sJoin2, _) = run("join-fetch", pf = false)
    val (sPoint2, _) = run("point-fetch", pf = true)
    require(rJoin.sameElements(rPoint), "fetch shapes disagree on results")
    println(f"[probe] RESULT join-fetch ${math.min(sJoin1, sJoin2)}%.1f s " +
      f"vs point-fetch ${math.min(sPoint1, sPoint2)}%.1f s (identical rows)")
    spark.stop()
  }
}
