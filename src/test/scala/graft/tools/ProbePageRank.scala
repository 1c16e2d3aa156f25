package graft.tools

import org.apache.spark.sql.functions._

/** Session probe for the r17 pageRank tasks: runs the exact Bench 100x
  * `graph_pagerank` job (5 hash-derived out-edges per doc over the
  * cached 5M-doc corpus, 25M edges) under each candidate loop-invariant
  * pin level — DISK_ONLY (the r16 shape; five rounds re-read the pins
  * from local disk, the shape most exposed to disk contention) vs
  * MEMORY_AND_DISK_SER (serialized blocks fit a 31g heap; excess spills
  * instead of all-of-it) — reporting wall + disk-spill per run, with an
  * optional induced-load mode (`load`: a background thread stream-writes
  * + reads an 8 GB scratch file to contend the local disks, the failure
  * mode DISK_ONLY is exposed to). `toy` mode times the 500-node registry
  * graph instead (the size-aware-pin overhead check).
  *
  *   sbt "Test/runMain graft.tools.ProbePageRank [disk|memser] [load|toy] [corpusDir]"
  */
object ProbePageRank {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    val level = args.headOption.getOrElse("disk") match {
      case "memser" => org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      case _        => org.apache.spark.storage.StorageLevel.DISK_ONLY
    }
    val mode = args.drop(1).headOption.getOrElse("")

    if (mode == "toy") {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val l = graft.Tables(spark, "/root/testdata/sf0.1").lineitem
      val edges = l.select((col("l_orderkey") % 500).as("src"),
        (col("l_partkey") % 500).as("dst"))
      (1 to 3).foreach { run =>
        val t0 = System.nanoTime()
        val n = graft.operators.Graph.pageRank(edges).count()
        println(f"[probe] toy run$run: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"($n ranked nodes)")
      }
      spark.stop(); return
    }

    // induced disk load: saturate the local disks with a sequential
    // writer+reader loop for the duration of the probe
    @volatile var stop = false
    val hog = if (mode != "load") None else Some {
      val t = new Thread(() => {
        val f = java.io.File.createTempFile("probe_diskhog", ".bin")
        f.deleteOnExit()
        val buf = new Array[Byte](1 << 20)
        scala.util.Random.nextBytes(buf)
        while (!stop) {
          val out = new java.io.FileOutputStream(f)
          (0 until 8192).foreach { _ => if (!stop) out.write(buf) }
          out.close()
          val in = new java.io.FileInputStream(f)
          while (!stop && in.read(buf) > 0) {}
          in.close()
        }
        f.delete()
      })
      t.setDaemon(true); t.start(); t
    }

    val dir = args.drop(2).headOption
      .getOrElse("target/bench_100x_v2_sf0.1_r1000")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
    val nDocs = docs.count()
    val edges = docs.select(col("doc_id").as("src"),
      explode(array((0 until 5).map(i =>
        pmod(xxhash64(col("doc_id"), lit(i)),
          lit(nDocs * 2))): _*)).as("dst"))
    val lsnr = new graft.ShuffleStatListener
    spark.sparkContext.addSparkListener(lsnr)
    (1 to 2).foreach { run =>
      lsnr.reset()
      val t0 = System.nanoTime()
      val n = graft.operators.Graph.pageRank(edges, bigPinLevel = level)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      val (_, _, _, _, _, spill) = lsnr.snapshot
      println(f"[probe] $level mode=${if (mode.isEmpty) "quiet" else mode} " +
        f"run$run: $sec%.1f s, spill=${spill / 1e9}%.2f GB " +
        f"(${nDocs * 5} edges, $n ranked)")
    }
    stop = true
    hog.foreach(_.join(2000))
    spark.stop()
  }
}
