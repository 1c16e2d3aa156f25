package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Ops metrics (SURVEY A5; reference statistics/statistics.go:36-136):
  * the reference exports Prometheus counters for consumed/parse-error/
  * flush totals and write-duration histograms. Here the per-batch numbers
  * come from Spark's StreamingQueryListener (rows/s, batch durations,
  * state rows) plus the writer accumulators (written/bad/retries), all
  * exposed as a snapshot map a /metrics endpoint can render.
  */
final class Metrics extends StreamingQueryListener {
  import Metrics.QuerySnapshot

  private val snapshots = new ConcurrentHashMap[String, QuerySnapshot]()
  val batchesCompleted = new LongAdder
  val rowsConsumed     = new LongAdder

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    batchesCompleted.increment()
    rowsConsumed.add(p.numInputRows)
    val lag = p.sources.map(s =>
      Metrics.lagFromOffsets(s.endOffset, s.latestOffset)).sum
    snapshots.put(name, QuerySnapshot(
      name, p.batchId,
      Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
      lag))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  /** `/state`-style snapshot (reference cmd/clickhouse_sinker/main.go:163-237). */
  def state: Map[String, QuerySnapshot] = {
    import scala.jdk.CollectionConverters._
    snapshots.asScala.toMap
  }

  /** Prometheus-exposition-format rendering of the counters. */
  def prometheus: String = {
    val sb = new StringBuilder
    sb.append("# TYPE graft_batches_completed counter\n")
    sb.append(s"graft_batches_completed ${batchesCompleted.sum()}\n")
    sb.append("# TYPE graft_rows_consumed counter\n")
    sb.append(s"graft_rows_consumed ${rowsConsumed.sum()}\n")
    state.values.foreach { s =>
      sb.append(s"""graft_processed_rows_per_second{task="${s.name}"} ${s.processedRowsPerSecond}\n""")
      sb.append(s"""graft_consumer_lag{task="${s.name}"} ${s.consumerLag}\n""")
    }
    sb.toString
  }
}

object Metrics {
  final case class QuerySnapshot(
      name: String,
      batchId: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      numInputRows: Long,
      batchDurationMs: Long,
      /** A4 — sum over topic-partitions of (broker latest - consumed). */
      consumerLag: Long = 0L)

  def install(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.streams.addListener(m)
    m
  }

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** A4 — consumer-lag sum from a Kafka source progress's offset JSONs
    * (`{"topic":{"0":123,...}}`): sum over partitions of
    * latest - consumed, clamped at 0. The reference sums broker high
    * watermark minus committed per assigned partition
    * (task/consumer.go lag stats); the Kafka source's `latestOffset` is
    * the same high watermark. Non-Kafka sources (files, memory) report
    * offsets in other shapes -> 0.
    */
  def lagFromOffsets(endOffset: String, latestOffset: String): Long = {
    def parse(s: String): Map[(String, String), Long] =
      try {
        val n = mapper.readTree(s)
        if (n == null || !n.isObject) Map.empty
        else {
          val out = Map.newBuilder[(String, String), Long]
          n.properties().forEach { topic =>
            if (topic.getValue.isObject)
              topic.getValue.properties().forEach { part =>
                if (part.getValue.isNumber)
                  out += ((topic.getKey, part.getKey) -> part.getValue.asLong())
              }
          }
          out.result()
        }
      } catch { case _: Exception => Map.empty }
    val end = parse(Option(endOffset).getOrElse(""))
    val latest = parse(Option(latestOffset).getOrElse(""))
    // a partition the query has not consumed yet (e.g. just added to the
    // topic) has its whole high watermark outstanding
    latest.map { case (tp, hi) =>
      math.max(0L, hi - end.getOrElse(tp, 0L))
    }.sum
  }
}
