package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{AnalyticsQueries, CheckQueries, EvalQueries, ExtensionQueries, JdbcQueries, ParityQueries, PipelineQueries, SamplingQueries, ScaleQueries, TemporalQueries, TokenQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.q01LoadingStatus(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * M5 training-data-pipeline extensions and analytics queries. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ ExtensionQueries.queries ++
      AnalyticsQueries.queries ++ CheckQueries.queries ++ TemporalQueries.queries ++
      SamplingQueries.queries ++ JdbcQueries.queries ++ ScaleQueries.queries ++
      PipelineQueries.queries ++ EvalQueries.queries ++ TokenQueries.queries

  /** One-time per-session materializations that queries depend on but
    * that should not be inside any timed region (q37's partitioned
    * at-rest layout). The bench calls this after warmup; Verify need
    * not — each query self-ensures its inputs.
    */
  /** Every fixture-backed query name, aggregated from the modules'
    * own declarations (next to their QueryFixtures call sites) — the
    * amortization is structural: a new fixture-backed wrapper joins
    * the warm list by declaring itself in its module, not by editing
    * this file. */
  def fixtureBackedQueries: Seq[String] =
    ExtensionQueries.fixtureBacked ++ PipelineQueries.fixtureBacked ++
      EvalQueries.fixtureBacked ++ TokenQueries.fixtureBacked

  def benchSetup(spark: SparkSession, sfDir: String,
      only: Option[Set[String]] = None): Unit = {
    // EVERY pre-build is gated on the subset actually reading it:
    // under a builder-side SPARK_GRAFT_ONLY subset (scale rehearsals),
    // an unselected fixture is minutes of irrelevant setup at 100×.
    // The driver sets no subset, so its runs always warm everything.
    def wanted(consumers: String*) = only.forall(o => consumers.exists(o.contains))
    if (wanted("q37_partition_pruning", "q111_pruning_estimate"))
      ScaleQueries.ensurePartitionedEvents(spark, sfDir)
    if (wanted("q108_bucketed_join"))
      ScaleQueries.ensureBucketedTables(spark, sfDir)
    // composed-query prior-state fixtures (QueryFixtures): the
    // materialized tables the fixture-backed queries read — built
    // here so the timed region times the operator, not the fixture.
    // The keep-list state builds inside the fixture-backed warms
    // below (q129/q214 construction calls ensureKeepListState).
    fixtureBackedQueries.filter(q => only.forall(_.contains(q)))
      .foreach(q => queries(q)(spark, sfDir))
    ()
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ ExtensionQueries.oracleSql ++
      AnalyticsQueries.oracleSql ++ CheckQueries.oracleSql ++ TemporalQueries.oracleSql ++
      SamplingQueries.oracleSql ++ JdbcQueries.oracleSql ++ ScaleQueries.oracleSql ++
      PipelineQueries.oracleSql ++ EvalQueries.oracleSql ++ TokenQueries.oracleSql
}
