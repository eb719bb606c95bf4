package graft

/** Targeted log hygiene for the runner mains (Bench/Verify).
  *
  * Every unpartitioned window remaining in the engine is BOUNDED BY
  * CONSTRUCTION — it ranks cells/bins/sketch/offset frames whose row
  * count is a config constant (≤ cells=4096, ≤ bins, ≤ salts·k),
  * never data-scale rows; each site carries a comment stating its
  * bound. Spark's `WindowExec: No Partition Defined` warning cannot
  * see that, so a full bench run emits hundreds of copies and a REAL
  * single-partition regression would drown in them (r10 verdict,
  * "what's wrong" #3). A `partitionBy(lit(0))`-style silencer does
  * not work: the optimizer folds constant partition keys away and
  * the warning fires anyway (measured). So the runners mute exactly
  * this one logger — interactive/developer sessions keep the
  * warning, and any other Spark warning still surfaces in bench
  * logs.
  */
object LogSilence {
  def boundedWindowWarnings(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // non-log4j2 backend: keep the noise
}
