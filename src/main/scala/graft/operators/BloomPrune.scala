package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toExpression}
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pruning for "huge probe side, large build side"
  * membership joins.
  *
  * Catalyst handles a SMALL build side by broadcasting a full hash
  * relation — that is [[graft.operators.TextAnalysis.contaminatedDocs]]'s
  * shape and it is optimal there. But a build side of hundreds of
  * millions of distinct keys (the gram set of a big benchmark suite, a
  * crawl-wide seen-URL registry) makes the hash relation GBs, so
  * Catalyst falls back to shuffling BOTH sides — and the probe side is
  * the 100 TB corpus, which makes that exchange the job's dominant cost.
  *
  * A Bloom filter at ~1% fpp costs ~1.2 bytes per key (~100× smaller
  * than the hash relation), so the scale shape is the one Spark's own
  * runtime row-level filtering uses, made explicit and reusable here:
  * reduce the build keys to ONE serialized Bloom via Spark's
  * `BloomFilterAggregate` (partial blooms are built map-side and merged
  * tree-wise — no row ever shuffles), embed the bytes into the probe
  * scan as a `BloomFilterMightContain` filter (codegen'd, evaluated
  * scan-local BEFORE any exchange), and let only the ~fpp surviving
  * probe rows reach the exact join. Bloom filters never produce false
  * NEGATIVES, so the trailing exact semi-join returns EXACTLY the plain
  * semi-join's rows — the Bloom only prunes the exchange, it never
  * changes the answer, and the oracle for a Bloom-pruned query is the
  * plain semi-join's SQL.
  */
object BloomPrune {

  /** Serialized Bloom filter of `key` over `keys`, built distributively
    * (map-side partial blooms, tree-merged). `expectedItems` sizes the
    * bit array for `fpp` at that cardinality; overshooting wastes bits,
    * undershooting raises the effective fpp but never correctness.
    */
  def bloomOf(keys: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val n = math.max(expectedItems, 1L)
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, fpp)
    val agg = new BloomFilterAggregate(
      toExpression(xxhash64(key)), Literal(n), Literal(numBits))
      .toAggregateExpression()
    keys.select(toColumn(agg).as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** Scan-local membership prefilter: true when `key` MIGHT be in the
    * Bloom (never false for a key that was added). Codegen'd; sits in
    * the probe scan's filter, before any exchange.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    toColumn(BloomFilterMightContain(
      Literal(bloom, BinaryType), toExpression(xxhash64(key))))

  /** `probe LEFT SEMI JOIN build ON probeKey = buildKey`, with the probe
    * side Bloom-pruned before the join. Result is EXACTLY the plain
    * semi-join (the Bloom admits ~fpp false positives; the exact join
    * removes them). The build side is scanned twice (distinct-count +
    * bloom build) — it is the smaller side by assumption, and both
    * passes reduce to one scalar/binary on the driver.
    */
  def semiJoin(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column, fpp: Double = 0.01): DataFrame = {
    val keys = build.select(buildKey.as("__bp_key")).distinct()
    val bloom = bloomOf(keys, col("__bp_key"), keys.count(), fpp)
    probe.filter(mightContain(bloom, probeKey))
      .join(keys, probeKey === col("__bp_key"), "left_semi")
  }
}