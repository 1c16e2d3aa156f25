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

  final case class QuerySnapshot(
      name: String,
      batchId: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      numInputRows: Long,
      batchDurationMs: Long)

  private val snapshots = new ConcurrentHashMap[String, QuerySnapshot]()
  val batchesCompleted = new LongAdder
  val rowsConsumed     = new LongAdder

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    batchesCompleted.increment()
    rowsConsumed.add(p.numInputRows)
    snapshots.put(name, QuerySnapshot(
      name, p.batchId,
      Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)))
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
    }
    sb.toString
  }
}

object Metrics {
  def install(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.streams.addListener(m)
    m
  }
}
