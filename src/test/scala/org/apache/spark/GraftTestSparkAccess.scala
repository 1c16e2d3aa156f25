package org.apache.spark

/** Test-only bridge to `private[spark]` surfaces. `SparkContext
  * .listenerBus` is package-private, but stage-count assertions need a
  * DETERMINISTIC drain — a fixed `Thread.sleep` undercounts whenever a
  * loaded machine drains the bus late (the flake ADVICE r16 called
  * out on the pageRank loop-invariant test).
  */
object GraftTestSparkAccess {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
