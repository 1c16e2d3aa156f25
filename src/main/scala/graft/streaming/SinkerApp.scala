package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.config.{ConfigReload, KafkaConfig, TaskConfig}
import graft.parse.Projector.Dim
import graft.sink.ChSql
import graft.types.{ChKind, ChType, ChTypeInfo}

/** The driver loop (SURVEY §3.2-§3.3): owns per-task streaming queries,
  * wires schema introspection -> projection dims, and runs the
  * stop-flush-ALTER-restart cycle when dynamic schema detects new keys —
  * the same lifecycle as the reference's Sinker.Run / applyConfig /
  * cloneTask chain, minus Nacos (Spark's own cluster manager schedules;
  * SURVEY C1-C2 non-goals).
  *
  * Tasks sharing a consumerGroup share one source DataFrame fan-out
  * (C4): each task filters the shared stream by its routing predicate
  * (FL7) and writes to its own sink.
  */
final class SinkerApp(
    spark: SparkSession,
    mkSource: TaskConfig => DataFrame,
    mkSink: (TaskConfig, Seq[Dim]) => Pipeline.SinkSpec,
    /** Executes DDL against ClickHouse (or records it under test). */
    execDdl: String => Unit,
    checkpointRoot: String) {

  /** Live schema per task: dims evolve as ALTERs land. */
  private val schemas = new ConcurrentHashMap[String, Seq[Dim]]()
  private val queries = new ConcurrentHashMap[String, StreamingQuery]()
  private val restarts = new ConcurrentHashMap[String, Integer]()

  def currentDims(task: String): Seq[Dim] = schemas.get(task)
  def restartCount(task: String): Int =
    Option(restarts.get(task)).map(_.intValue).getOrElse(0)

  /** Start one task (one streaming query). */
  def startTask(task: TaskConfig, initialDims: Seq[Dim]): StreamingQuery = {
    schemas.putIfAbsent(task.name, initialDims)
    val dims = schemas.get(task.name)
    val src  = Pipeline.routingFilter(mkSource(task), task)
    val q = Pipeline.start(spark, src, task, dims,
      mkSink(task, dims), s"$checkpointRoot/${task.name}",
      onNewKeys = keys => onNewKeys(task, keys))
    queries.put(task.name, q)
    q
  }

  /** §3.3 — dynamic schema evolution: issue ALTERs, refresh the cached
    * dims, and restart the query from its checkpoint under the new
    * schema. The in-flight micro-batch still writes under the old schema
    * (the reference drains, then restarts — same observable behavior).
    */
  private def onNewKeys(task: TaskConfig, keys: Seq[(String, ChKind)]): Unit = {
    val dims = schemas.get(task.name)
    val ddl = SchemaEvolutionDdl.statements(task, dims.size, keys)
    ddl.foreach(execDdl)
    val newDims = dims ++ keys.sortBy(_._1).map { case (k, kind) =>
      Dim(k, ChTypeInfo(kind, nullable = true,
        dateTime64Precision = if (kind == ChKind.DateTime) 3 else 0))
    }
    schemas.put(task.name, newDims)
    restarts.merge(task.name, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
    // restart asynchronously: stopping the query from inside its own
    // foreachBatch would deadlock on the streaming lock
    new Thread(() => {
      val old = queries.get(task.name)
      if (old != null) old.stop()
      startTask(task, newDims)
    }, s"graft-restart-${task.name}").start()
  }

  def awaitAllProcessed(): Unit =
    queries.values().forEach(q => if (q.isActive) q.processAllAvailable())

  def stopAll(): Unit = queries.values().forEach(_.stop())

  /** C3 — config hot-reload with a deep diff (task/sinker.go:340-519):
    * stop removed/changed consumers, start new ones, re-init changed
    * tasks in place; untouched tasks keep running. Returns the applied
    * plan.
    */
  def applyConfig(oldTasks: Seq[TaskConfig], newTasks: Seq[TaskConfig],
      dimsFor: TaskConfig => Seq[Dim],
      globalSectionChanged: Boolean = false): ConfigReload.Plan = {
    val plan = ConfigReload.plan(oldTasks, newTasks, globalSectionChanged)
    val byName = newTasks.map(t => t.name -> t).toMap
    (plan.stopTasks ++ plan.restartTasks).foreach { n =>
      Option(queries.remove(n)).foreach(_.stop())
      // drop the cached schema so the restart re-introspects through
      // dimsFor — startTask's putIfAbsent would otherwise pin the OLD
      // config's dims onto the restarted query
      schemas.remove(n)
    }
    (plan.startTasks ++ plan.restartTasks).foreach { n =>
      byName.get(n).foreach(t => startTask(t, dimsFor(t)))
    }
    plan
  }
}

/** DDL for schema evolution, shaped by the task config. */
object SchemaEvolutionDdl {
  def statements(task: TaskConfig, currentDims: Int,
      keys: Seq[(String, ChKind)]): Seq[String] = {
    val Array(db, tbl) = (task.tableName.split('.') match {
      case Array(d, t) => Array(d, t)
      case Array(t)    => Array("default", t)
    })
    ChSql.addColumnsStatements(db, tbl, keys)
  }
}
