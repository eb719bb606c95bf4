package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized prior-state fixtures for COMPOSED queries — the
  * `ensurePartitionedEvents` discipline (ScaleQueries) generalized.
  *
  * q129/q133/q135 evaluate an operator AGAINST state that a production
  * deployment reads from a materialized table (a prior run's keep-list
  * and signature store, a scored-corpus table, a brute-force truth
  * set). Rebuilding that state from raw text inside the timed region
  * made the bench time the fixture, not the operator (r10 verdict
  * item 1). Each build is written to per-process scratch parquet at
  * most once and read back — the bench pays it in `SparkEntry
  * .benchSetup`, Verify pays it on first touch, and the query then
  * times what it is: the fold / the weighted metric / the approximate-
  * index eval. CORRECTNESS is untouched: the fixture contents are
  * exactly what the inline build produced (deterministic pipelines,
  * parquet round-trips are exact for every type involved), and the
  * oracles still state the full from-scratch SQL.
  */
object QueryFixtures {

  private[graft] def dirFor(d: String, name: String): String =
    s"target/fixtures/pid-${ProcessHandle.current().pid()}/${d.replaceAll("[^A-Za-z0-9.]", "_")}/$name"

  /** Write `build` to parquet at most once per process (per-pid
    * scratch, so a present _SUCCESS marker means this process already
    * wrote it) and read it back.
    */
  def ensure(spark: SparkSession, d: String, name: String)(build: => DataFrame): DataFrame = {
    val dir = dirFor(d, name)
    if (!new java.io.File(dir, "_SUCCESS").exists())
      build.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }
}
