package graft.tools

/** Session probe for the r17 100x measurement gate: sanity-checks
  * [[graft.ExternalLoad]] — the /proc/stat-minus-own-JVM busy-core
  * estimator that replaces 1-min loadavg for gating the 100x tier (the
  * loadavg reads ~30 mid-bench whether or not anyone else is running).
  * Measured on the bench box (r17): 0.02 external cores while this JVM
  * burns a core on a quiet box; 8.04 with an 8-process external hog —
  * self-load subtracts out, external load shows at ~unit accuracy.
  *
  *   sbt "Test/runMain graft.tools.ProbeExtLoad"
  */
object ProbeExtLoad {
  def main(args: Array[String]): Unit = {
    def window(label: String): Unit = {
      val a = graft.ExternalLoad.snap()
      val t0 = System.nanoTime()
      while ((System.nanoTime() - t0) / 1e9 < 5) {} // 1 busy core, self
      val b = graft.ExternalLoad.snap()
      println(f"[ext] $label: " +
        f"${graft.ExternalLoad.externalCores(a, b, 32)}%.2f external cores")
    }
    window("quiet+self1core")
    val procs = (1 to 8).map(_ => new ProcessBuilder("sh", "-c",
      "timeout 8 sh -c 'while :; do :; done'").start())
    Thread.sleep(1500)
    window("hog8+self1core")
    procs.foreach(_.destroyForcibly())
  }
}
