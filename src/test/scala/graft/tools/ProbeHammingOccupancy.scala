package graft.tools

import org.apache.spark.sql.functions._

/** Session probe for the r17 task "extend the occupancy guard to the
  * banded fingerprint families": measures wall + candidate volume of
  * the 4×16-bit pigeonhole band join over n DISTINCT random 64-bit
  * fingerprints, sweeping n across the occupancy range (occupancy per
  * band bucket = n / 65536). Unlike the RHP embedding bands, the 64-bit
  * hamming band width is FIXED by the pigeonhole construction — there
  * is no `bandBitsFor` lever — so this probe establishes whether an
  * `expectedDistinct`-style guard transfers at all.
  *
  * FINDING (r17, BENCHNOTES): it does NOT — wall stays near-linear
  * through occupancy ~488 (32M distinct fps, 51.8 s) because the
  * hamming predicate fuses into the band join (join-local codegen'd
  * bit_count; no verify join, no pre-filter materialization), so
  * uniform quadratic candidates cost ~2 instructions each. The real
  * blowup mode is SKEW/identical-fp cliques — handled by collapse-first
  * and the maxBucketSize cap, not by an occupancy refusal.
  *
  *   sbt "Test/runMain graft.tools.ProbeHammingOccupancy"
  */
object ProbeHammingOccupancy {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(250000L, 1000000L, 2000000L, 4000000L)
    sizes.foreach { n =>
      // distinct random fps (xxhash64 of distinct ids: collisions are
      // ~n^2/2^64, nil at these n) — the post-collapse normal form
      val fps = spark.range(n).select(col("id").as("asset_id"),
        xxhash64(col("id"), lit(7L)).as("dhash"))
      val t0 = System.nanoTime()
      val cnt = graft.operators.Multimodal.imageNearDups(fps, maxHamming = 3)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] n=$n%-8d occ=${n / 65536.0}%6.1f " +
        f"pairs=$cnt%-6d wall=$sec%7.1f s")
    }
    spark.stop()
  }
}
