package graft.tools

import java.nio.file.Files

import graft.GraftSession
import graft.config.TaskConfig
import graft.parse.Projector.Dim
import graft.sink.ChWriter
import graft.streaming.Pipeline
import graft.types.ChType

/** Manual end-to-end drive of the ingest pipeline through the public API:
  * messages on disk -> streaming query -> per-shard sink files.
  */
object DriveIngest {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val in  = Files.createTempDirectory("drive_in")
    val out = Files.createTempDirectory("drive_out")
    val ck  = Files.createTempDirectory("drive_ck")
    val msgs = (1 to 5000).map { i =>
      val ss = f"${i % 60}%02d"
      s"""{"time":"2024-03-01T10:00:$ss+00:00","name":"n$i","value":$i,"price":${i / 100.0}}"""
    }
    Files.write(in.resolve("m.txt"), msgs.mkString("\n").getBytes)

    val dims = Seq(
      Dim("time", ChType.whichType("DateTime")),
      Dim("name", ChType.whichType("String")),
      Dim("value", ChType.whichType("Float32")),
      Dim("price", ChType.whichType("Decimal32(3)")))
    val names = dims.map(_.name)
    val outS = out.toString
    val task = TaskConfig(name = "drive", topic = "t", consumerGroup = "g",
      bufferSize = 4096, flushInterval = 1)
    val q = Pipeline.start(spark,
      Pipeline.fileSource(spark, in.toString, "t"), task, dims,
      Pipeline.SinkSpec(4, ChWriter.WriteConfig(4, retryTimes = 2, retryDelayMs = 5),
        () => new ChWriter.JsonLinesWriter(outS, names)),
      ck.toString)
    q.processAllAvailable(); q.stop()

    val shards = out.toFile.listFiles().filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    println("SHARD_DIRS=" + shards.map(_.getName).mkString(","))
    val written = spark.read.json(out.toString + "/shard=*/*.jsonl")
    println("WRITTEN_COUNT=" + written.count())
    written.orderBy("name").show(3, false)
    spark.stop()
  }
}
