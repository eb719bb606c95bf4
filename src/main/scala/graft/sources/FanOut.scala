package graft.sources

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-source fan-out with per-source fault isolation (SURVEY.md
  * S4/S5/S6, reference: data_consistency_checks.py:85-116).
  *
  * The reference loops over discovered `openmrs_*` schemas
  * sequentially and, on MySQL error 1146 (missing table), skips the
  * whole schema's result atomically (§2.8.8) — a missing table never
  * drops just one branch. Re-expressed Spark-first: each source
  * contributes one *lazy* plan; plan construction (which is where a
  * missing path/table surfaces as AnalysisException) is wrapped in
  * Try per source, failed sources are recorded and skipped, and the
  * survivors union into one Catalyst DAG whose per-source subtrees
  * execute as parallel stages — the reference's sequential visit
  * parallelized for free.
  */
object FanOut {

  /** One skipped source and why (the reference's log line, as data). */
  final case class SkipRecord(source: String, reason: String)

  /** "N out of M processed" run telemetry line (A7, DCC:146-147) —
    * single definition shared by FanOutResult and Pipelines.RunReport.
    */
  def telemetryLine(total: Int, skipped: Int): String =
    s"${total - skipped} out of $total sources processed successfully"

  final case class FanOutResult(df: Option[DataFrame], skipped: Seq[SkipRecord]) {
    def telemetry(total: Int): String = telemetryLine(total, skipped.size)
  }

  /** Enumerate source "schemas": subdirectories of a root (the
    * SHOW DATABASES analog, S1) filtered by name prefix (P1).
    */
  def discoverSources(root: String, prefix: String): Seq[String] = {
    val dir = new java.io.File(root)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(_.getName)
      .filter(_.startsWith(prefix))
      .sorted
      .toSeq
  }

  /** Default skip classifier: a plan that fails to RESOLVE (missing
    * table/path → AnalysisException) is skippable; everything else is
    * a real failure.
    */
  val analysisSkip: Throwable => Option[String] = {
    case e: AnalysisException => Some(e.getSimpleMessage.linesIterator.next())
    case _ => None
  }

  /** Build one plan per source with `read`, skipping sources whose
    * failure `skipReason` classifies as benign (default: resolution
    * failures — the 1146-skip analog); anything else propagates, like
    * the reference re-raises non-1146 errors (S6, DCC:108-112). JDBC
    * fan-outs pass a SQLSTATE-based classifier instead
    * ([[Jdbc.fanOutSchemas]]).
    *
    * Each surviving frame is tagged with a `source_schema` column so
    * downstream grouping can attribute rows, then unioned by name.
    */
  def fanOut(
      sources: Seq[String], read: String => DataFrame,
      skipReason: Throwable => Option[String] = analysisSkip): FanOutResult = {
    val results = sources.map { src =>
      src -> Try {
        // force analysis now so resolution errors surface per-source
        val df = read(src)
        df.queryExecution.assertAnalyzed()
        df.withColumn("source_schema", lit(src))
      }
    }
    val skipped = results.collect {
      case (src, Failure(e)) if skipReason(e).isDefined =>
        SkipRecord(src, skipReason(e).get)
    }
    results.collectFirst {
      case (_, Failure(e)) if skipReason(e).isEmpty => e
    }.foreach(throw _)
    val frames = results.collect { case (_, Success(df)) => df }
    FanOutResult(frames.reduceOption(_ unionByName _), skipped)
  }

  /** Convenience: discover + fan out in one call. */
  def fanOutFromRoot(spark: SparkSession, root: String, prefix: String)(
      read: String => DataFrame): FanOutResult = {
    val sources = discoverSources(root, prefix)
    fanOut(sources, read)
  }
}
