package graft.shard

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GoHash
import graft.types.{ChKind, ChTypeInfo}

/** Shard-routing policies (SURVEY §2.10, reference
  * `/root/reference/task/sharding.go`). Each policy yields a `shard`
  * Column in [0, numShards); the pipeline then repartitions on it so one
  * Spark partition maps to one ClickHouse shard batch.
  *
  * Scale note: this is the ONE shuffle of the ingest path (reference has
  * the same single hop). Everything upstream (parse/project) is
  * narrow/pipelined; everything downstream (per-shard write) is
  * partition-local. At 1000 executors the shuffle fan-in per shard is
  * bounded by numShards, and AQE coalesces small shard partitions.
  */
object Sharding {

  /** X1 — stripe policy for numeric-ish keys:
    * `shard = (uint64(val) / stripe) % numShards`, with Go uint64 wrap
    * semantics for negative values (sharding.go:26-103).
    */
  def stripe(key: Column, keyType: ChTypeInfo, stripeSize: Long, numShards: Int): Column = {
    val asLong: Column = keyType.kind match {
      case ChKind.DateTime => unix_timestamp(key)
      case ChKind.Float32 | ChKind.Float64 | ChKind.Decimal => key.cast(LongType)
      case _ => key.cast(LongType)
    }
    // pure long arithmetic (divideUnsigned/remainderUnsigned) — no Decimal
    // on the shuffle-key hot path
    GoHash.unsignedStripeMod(asLong, stripeSize, numShards)
  }

  /** X2 — hash policy for string keys: `xxhash64(val) % numShards` with
    * Go-parity XXH64 seed 0 (sharding.go:104-116).
    */
  def hash(key: Column, numShards: Int): Column =
    GoHash.unsignedMod(GoHash.goXxHash64(key), numShards)

  /** X3 — default policy from Kafka coordinates:
    * `shard = ((offset * (partition+1)) >> log2(bufferSize)) % numShards`
    * (task/task.go:227-229; offShift task.go:126-127).
    */
  def byOffset(offset: Column, partition: Column, bufferSize: Int, numShards: Int): Column = {
    val shift = log2floor(bufferSize)
    GoHash.unsignedMod(
      shiftright(offset * (partition + lit(1)), shift), numShards)
  }

  /** GetShift parity (util/common.go:99-104): floor(log2(n)). */
  def log2floor(n: Int): Int = 63 - java.lang.Long.numberOfLeadingZeros(n.toLong)

  /** D4 — auto sharding key for Replacing engines without a configured
    * key: xxhash64 over the "."-joined sorting-key columns
    * (output/clickhouse.go:724-799; task/task.go:274-281).
    */
  def autoShardingKey(sortingKeys: Seq[Column]): Column =
    GoHash.goXxHash64(concat_ws(".", sortingKeys: _*))

  /** X4/X5 — route a batch: add the shard column and co-locate each shard
    * in its own partition group for the per-shard writer. With
    * `writersPerShard > 1` the repartition key is salted so each shard's
    * rows spread over that many Spark tasks — the analogue of the
    * reference's `MaxOpenConns` writer pool per shard
    * (util/workerpool.go:29-118, pool/conn.go:178): write parallelism is
    * `numShards * writersPerShard`, not bounded by the shard count.
    */
  def partitionByShard(df: DataFrame, shard: Column, numShards: Int,
      writersPerShard: Int = 1): DataFrame =
    if (writersPerShard <= 1)
      df.withColumn("__shard__", shard)
        .repartition(numShards, col("__shard__"))
    else
      df.withColumn("__shard__", shard)
        .withColumn("__salt__", pmod(spark_partition_id(), lit(writersPerShard)))
        .repartition(numShards * writersPerShard, col("__shard__"), col("__salt__"))
        .drop("__salt__")
}
