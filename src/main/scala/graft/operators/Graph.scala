package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * does, and the loop INVARIANTS (`e` after edge dedup, `outdeg`,
    * `nodes`) are materialized the same way ONCE before the loop —
    * otherwise each iteration's lineage re-runs the edge-dedup shuffle,
    * the out-degree aggregation, and the node-set distinct from the
    * scan up (~3 corpus-sized exchanges × iterations of pure
    * redundancy at 25 M edges). The single driver-side scalar is `n`
    * (node count) for the teleport base — O(1), never corpus-sized.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", iterations: Int = 5,
      dampNum: Long = 85, scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "at least one iteration")
    require(dampNum > 0 && dampNum < 100, "dampNum is a percentage in (0,100)")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val base = ((scale * (100 - dampNum)) / 100) / n // exact Long arithmetic

    var rank = nodes.select(col("node"), lit(scale / n).as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = e.join(outdeg, "src")
        .join(rank.withColumnRenamed("node", "src"), "src")
        .selectExpr("dst AS node", "rank div deg AS c")
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      rank = nodes.join(contribs, Seq("node"), "left")
        .selectExpr("node",
          s"$base + (coalesce(s, CAST(0 AS BIGINT)) * $dampNum) div 100 AS rank")
        .localCheckpoint()
    }
    rank
  }
}
