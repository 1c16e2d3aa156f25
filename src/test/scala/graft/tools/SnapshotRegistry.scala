package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off fixture generator for RegistryCanarySpec: materializes every
  * registry query at sf0.001 and snapshots (rows, schema) to a JSON
  * resource. Re-run ONLY when a query's output contract intentionally
  * changes:
  *
  *   sbt "Test/runMain graft.tools.SnapshotRegistry \
  *     /root/testdata/sf0.001 src/test/resources/registry_green.json"
  *
  * The spec replays the same (query, sfDir) pairs and diffs — so a
  * silently dropped oracle, a renamed column, a type drift, or a
  * changed row count turns `sbt test` red (the r11 lesson: an
  * author-time guard must agree with the driver's gate, and the gate's
  * inputs are exactly name/schema/rows).
  */
object SnapshotRegistry {
  def schemaString(df: org.apache.spark.sql.DataFrame): String =
    df.schema.fields
      .map(f => s"${f.name}:${f.dataType.simpleString}")
      .mkString(",")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val spark = graft.GraftSession.local(8)
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val df = fn(spark, sfDir)
        val n = df.count()
        s"""  "$name": {"rows": $n, "schema": "${schemaString(df)}"}"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      rows.mkString("{\n", ",\n", "\n}\n"))
    println(s"[snapshot] wrote ${rows.size} entries to $outPath")
    spark.stop()
  }
}
