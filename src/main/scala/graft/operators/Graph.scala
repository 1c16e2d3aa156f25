package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph operators for corpus curation — link-graph signals (domain
  * authority ranking a la CommonCrawl's harmonic/PageRank exports) used
  * to weight web-scraped training data.
  */
object Graph {

  /** PageRank in exact scaled-integer arithmetic: ranks live as
    * `floor(p * scale)` BIGINTs and every update is integer division /
    * multiplication, so the result is bit-identical on any engine, any
    * partitioning, any summation order — float PageRank cannot promise
    * that (FP addition is not associative; a shuffle reorder changes the
    * last ulps), which is why this tier quantizes like the classifier
    * weights do.
    *
    * Update rule (damping d = dampNum/100):
    * `R'(v) = ((scale * (100-dampNum)) div 100) div n
    *          + (sum over in-edges of R(u) div deg(u)) * dampNum div 100`.
    * Dangling-node mass is dropped, not redistributed (the common
    * simplification; ranks then sum to < scale — documented contract).
    * Duplicate edges are collapsed before ranking.
    *
    * Scale shape: per iteration ONE equi-join of edges against the
    * current rank vector plus one map-side-combined sum by dst — the
    * standard distributed PR round. `localCheckpoint` truncates the
    * 5-iteration lineage the same way [[Dedup.connectedComponents]]
    * does, and the loop INVARIANTS are persisted before the loop: the
    * deduped edge set, the node set, and the whole degree-annotated
    * edge table `eDeg` (= edges ⋈ out-degrees) — without that, each
    * iteration's lineage re-runs the edge-dedup shuffle, the out-degree
    * aggregation, the degree join, and the node-set distinct from the
    * scan up (~3 corpus-sized exchanges × iterations of pure redundancy
    * at 25 M edges, ~40 % of the r15 wall). The single driver-side
    * scalar is `n` (node count) for the teleport base — O(1), never
    * corpus-sized.
    *
    * Pin strategy is SIZE-AWARE (`pinEdgeThreshold`, on the deduped
    * edge count — known after one count job that every path needs
    * anyway): big graphs pin nodes/eDeg to DISK_ONLY and materialize
    * them EAGERLY before the loop (memory-resident pins measured 388 MB
    * of aggregate spill at 25 M edges — loop-held storage blocks steal
    * unified memory from the per-round sort/agg work; MEMORY_AND_DISK_SER
    * probed within noise of DISK_ONLY wall-to-wall but held ~0.5 GB of
    * storage through the loop for nothing, BENCHNOTES r17 — and
    * local-disk re-reads per round are sequential and cheap), while
    * persist KEEPS lineage so an executor lost mid-ranking recomputes
    * deterministic blocks instead of failing the job (the
    * localCheckpoint trade documented on [[Similarity.pqTopKWithBooks]]).
    * Small graphs skip the eager counts and pin lazily in memory: three
    * DISK_ONLY materialization jobs cost more wall than the
    * recomputation they avoid (~3.8 s of pure overhead measured on a
    * 500-node graph), and a lazy persist still caches the invariants on
    * their first use inside iteration 1 — later iterations read the
    * cache either way, so the marginal-stage shape is identical.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", iterations: Int = 5,
      dampNum: Long = 85, scale: Long = 1000000000000L,
      pinEdgeThreshold: Long = 1000000L,
      bigPinLevel: StorageLevel = StorageLevel.DISK_ONLY): DataFrame = {
    require(iterations >= 1, "at least one iteration")
    require(dampNum > 0 && dampNum < 100, "dampNum is a percentage in (0,100)")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m = e.count() // sizes the pin strategy; materializes e either way
    val small = m < pinEdgeThreshold
    def pin(df: DataFrame): DataFrame =
      if (small) df.persist(StorageLevel.MEMORY_AND_DISK)
      else { val p = df.persist(bigPinLevel); p.count(); p }
    val nodes = pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    // the whole (src, dst, deg) join is loop-invariant too — pinning it
    // (not just e and outdeg separately) removes one corpus-sized join
    // per iteration, not merely its recomputation
    val eDeg = pin(e.join(
      e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src"))
    // big path: nodes/eDeg are materialized, e is never read again; the
    // small path's lazy pins still need e until iteration 1 caches
    // them, so e stays pinned (bounded by the threshold) until finally
    if (!small) e.unpersist()
    try {
      val n = nodes.count()
      require(n > 0, "empty graph")
      val base = ((scale * (100 - dampNum)) / 100) / n // exact Long arithmetic

      var rank = nodes.select(col("node"), lit(scale / n).as("rank"))
      for (_ <- 1 to iterations) {
        val contribs = eDeg
          .join(rank.withColumnRenamed("node", "src"), "src")
          .selectExpr("dst AS node", "rank div deg AS c")
          .groupBy(col("node")).agg(sum(col("c")).as("s"))
        rank = nodes.join(contribs, Seq("node"), "left")
          .selectExpr("node",
            s"$base + (coalesce(s, CAST(0 AS BIGINT)) * $dampNum) div 100 AS rank")
          .localCheckpoint()
      }
      rank
    } finally {
      // unpersist on the failure path too (an empty graph or a failed
      // iteration must not leak loop-held blocks for the session's life)
      e.unpersist()
      nodes.unpersist()
      eDeg.unpersist()
    }
  }
}
