package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.TaskConfig
import graft.dynamic.SchemaEvolution
import graft.dynamic.SchemaEvolution.NewKeyPolicy
import graft.parse.Projector.Dim
import graft.sink.{ChSql, ChWriter}
import graft.streaming.Pipeline
import graft.types.{ChKind, ChType}

/** E2E golden test mirroring the reference's `go.test.sh`: 100 000 JSON
  * messages in 5 cohorts, streamed through the full pipeline
  * (file source -> tolerant projection -> shard -> per-shard sink), with
  * the cohort row counts and the dynamic-schema golden
  * (`newkey00 Bool .. newkey04 DateTime64(3)`, arrays/objects skipped)
  * asserted like go.test.sh:58-76.
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(8)
  import spark.implicits._

  private def cohortMessages: IndexedSeq[String] = {
    val now   = "2023-05-01T12:34:56.789Z"
    (1 to 100000).map { i =>
      val base = s""""time": "$now", "name": "name$i", "value": $i, "price": ${i / 1000.0}"""
      val extra =
        if (i <= 10000) ""
        else if (i <= 30000) s""", "newkey00": false, "newkey01": $i"""
        else if (i <= 50000)
          s""", "newkey02": $i.123, "newkey03": "name$i", "newkey04": "$now", "newkey05": {"k1":1,"k2":2}"""
        else if (i <= 70000)
          s""", "newkey06": [$i], "newkey07": [$i.123], "newkey08": ["name$i"], "newkey09": ["$now"], "newkey10": [{"k":1},{"k":2}]"""
        else ""
      s"{$base$extra}"
    }
  }

  private val fixedDims = Seq(
    Dim("time", ChType.whichType("DateTime")),
    Dim("name", ChType.whichType("String")),
    Dim("value", ChType.whichType("Float32")),
    Dim("price", ChType.whichType("Decimal32(3)")))

  test("go.test.sh fixed-schema E2E: 100k messages through the stream") {
    val inDir  = Files.createTempDirectory("graft_in")
    val outDir = Files.createTempDirectory("graft_out")
    val ckDir  = Files.createTempDirectory("graft_ck")
    val msgs = cohortMessages
    msgs.grouped(25000).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(inDir.resolve(s"part-$i.txt"),
        chunk.mkString("\n").getBytes("UTF-8"))
    }

    val task = TaskConfig(name = "test_fixed_schema", topic = "topic1",
      consumerGroup = "g1", bufferSize = 50000, flushInterval = 1)
    val numShards = 4
    val outStr = outDir.toString
    val colNames = fixedDims.map(_.name) // local copy: lambda must not capture the suite
    val sink = Pipeline.SinkSpec(
      numShards,
      ChWriter.WriteConfig(numShards, retryTimes = 2, retryDelayMs = 10),
      () => new ChWriter.JsonLinesWriter(outStr, colNames))

    val src = Pipeline.fileSource(spark, inDir.toString, "topic1")
      // fileSource has no headers column -> topic routing branch
    val routed = Pipeline.routingFilter(src, task)
    val q = Pipeline.start(spark, routed, task, fixedDims, sink, ckDir.toString)
    q.processAllAvailable()
    q.stop()

    // golden: every message lands exactly once, spread over the shards
    val files = outDir.toFile.listFiles().filter(_.isDirectory)
    assert(files.map(_.getName).sorted.forall(_.startsWith("shard=")))
    val written = spark.read.json(outDir.toString + "/shard=*/*.jsonl")
    assert(written.count() === 100000L)
    // projection check: values survived the tolerant casts
    val r = written.agg(
      sum(col("value")).as("sv"),
      count(when(col("name").startsWith("name"), 1)).as("named")).head()
    assert(r.getDouble(0) === (1L to 100000L).map(_.toDouble).sum)
    assert(r.getLong(1) === 100000L)
  }

  test("go.test.sh dynamic-schema golden: newkey00-04 added, 05-10 skipped") {
    val df = cohortMessages.toDF("value")
    val known = fixedDims.map(_.name).toSet
    val got = SchemaEvolution.detectNewKeys(df, known, NewKeyPolicy())
    assert(got.toMap === Map(
      "newkey00" -> ChKind.Bool,
      "newkey01" -> ChKind.Int64,
      "newkey02" -> ChKind.Float64,
      "newkey03" -> ChKind.Str,
      "newkey04" -> ChKind.DateTime))

    val ddl = SchemaEvolution.changeSchemaStatements(
      "default", "test_dynamic_schema", currentDims = 4, got, NewKeyPolicy())
    assert(ddl === Seq(
      "ALTER TABLE `default`.`test_dynamic_schema` ADD COLUMN IF NOT EXISTS `newkey00` Nullable(Bool)",
      "ALTER TABLE `default`.`test_dynamic_schema` ADD COLUMN IF NOT EXISTS `newkey01` Nullable(Int64)",
      "ALTER TABLE `default`.`test_dynamic_schema` ADD COLUMN IF NOT EXISTS `newkey02` Nullable(Float64)",
      "ALTER TABLE `default`.`test_dynamic_schema` ADD COLUMN IF NOT EXISTS `newkey03` Nullable(String)",
      "ALTER TABLE `default`.`test_dynamic_schema` ADD COLUMN IF NOT EXISTS `newkey04` Nullable(DateTime64(3))"))
  }

  test("white/black list gates new keys (FL3)") {
    val df = Seq("""{"ok_key": 1, "secret_key": 2, "other": 3}""").toDF("value")
    val got = SchemaEvolution.detectNewKeys(df, Set.empty,
      NewKeyPolicy(whiteList = Some("key$"), blackList = Some("^secret")))
    assert(got.toMap === Map("ok_key" -> ChKind.Int64))
  }

  test("static fields override message content (P6)") {
    val df = Seq("""{"a": 1, "b": 2}""").toDF("value")
    val dims = Seq(
      Dim("a", ChType.whichType("Int64")),
      Dim("b", ChType.whichType("Int64")),
      Dim("c", ChType.whichType("String")))
    val out = graft.parse.Projector.projectJson(
      df, dims, graft.functions.ChGetters.ParseOpts(),
      fields = Map("b" -> "42", "c" -> "\"injected\""))
    val r = out.head()
    assert(r.getLong(0) === 1L)
    assert(r.getLong(1) === 42L)   // static field wins
    assert(r.getString(2) === "injected")
  }

  test("not-nullable guard drops the whole message (F14/FL2)") {
    val df = Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2}""",
      """not json at all""").toDF("value")
    val dims = Seq(
      Dim("a", ChType.whichType("Int64")),
      Dim("b", ChType.whichType("Nullable(String)"), notNullable = true))
    val out = graft.parse.Projector.projectJson(
      df, dims, graft.functions.ChGetters.ParseOpts())
    // corrupt row dropped (P5), null-in-notnull row dropped (FL2)
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("tolerant write skips bad rows and retries transient errors (S6/S7)") {
    import org.apache.spark.sql.Row
    var failuresLeft = 2
    val written = scala.collection.mutable.ArrayBuffer.empty[Row]
    val w = new ChWriter.RowWriter {
      override def open(shard: Int): Unit = ()
      override def writeBatch(rows: Seq[Row]): Unit = {
        if (failuresLeft > 0) { failuresLeft -= 1; throw new RuntimeException("transient") }
        val bad = rows.zipWithIndex.collect { case (r, i) if r.getInt(0) < 0 => i }
        if (bad.nonEmpty) throw new ChWriter.BadRowsException(bad, "bad rows")
        written ++= rows
      }
      override def close(): Unit = ()
    }
    val rows = Seq(Row(1), Row(-5), Row(3), Row(-7), Row(4))
    val (ok, bad, retries) = ChWriter.writeWithRetry(
      w, rows, ChWriter.WriteConfig(1, retryTimes = 5, retryDelayMs = 1))
    assert(ok === 3L)
    assert(bad === 2L)
    assert(retries === 2L)
    assert(written.map(_.getInt(0)).toSeq === Seq(1, 3, 4))
  }

  test("task config parses the reference's hjson-style task section") {
    val cfg = TaskConfig.fromJson(
      """{
        |  // hjson-style comment
        |  name: "test_dynamic_schema",
        |  topic: "topic1",
        |  consumerGroup: "group1",
        |  earliest: true,
        |  parser: "json",
        |  autoSchema: true,
        |  excludeColumns: ["day"],
        |  dynamicSchema: true,
        |  bufferSize: 50000,
        |  fields: {"env": "prod", "pi": 3.14},
        |  dims: [
        |    {name: "time", type: "DateTime"},
        |    {name: "name", type: "String", sourcename: "title"},
        |  ],
        |}""".stripMargin)
    assert(cfg.name === "test_dynamic_schema")
    assert(cfg.topic === "topic1")
    assert(cfg.bufferSize === 50000)
    assert(cfg.dynamicSchema)
    assert(cfg.fields === Map("env" -> "\"prod\"", "pi" -> "3.14"))
    assert(cfg.dims.map(_.source) === Seq("time", "title"))
    assert(cfg.excludeColumns === Seq("day"))
  }

  test("insert/introspection SQL golden (S8/S11)") {
    assert(ChSql.insertStatement("db", "tbl", Seq("a", "b")) ===
      "INSERT INTO `db`.`tbl` (`a`,`b`)")
    assert(ChSql.insertStatement("db", "tbl", Seq("a", "b"), withValues = true) ===
      "INSERT INTO `db`.`tbl` (`a`,`b`) VALUES (?,?)")
    assert(ChSql.columnsQuery("db", "tbl").contains("default_kind != 'MATERIALIZED'"))
    val dims = ChSql.dimsFromColumns(
      Seq(("a", "Int64", ""), ("b", "Nullable(String)", "DEFAULT"),
        ("mat", "String", "MATERIALIZED")),
      referedNullable = Set("b"), excluded = Set("mat"))
    assert(dims.map(_._1) === Seq("a", "b"))
    assert(!dims(1)._2.nullable) // refered-nullable override
  }
}
