package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Md5Expressions

/** Benchmark decontamination: the standard training-data hygiene pass
  * that flags (and removes) corpus documents sharing word n-grams
  * with an evaluation/benchmark set, so eval results aren't inflated
  * by memorized test data.
  *
  * Semantics: a corpus document is contaminated iff it shares at
  * least `minOverlap` DISTINCT word n-grams with the union of all
  * benchmark documents' n-grams. Exact n-gram match (the published
  * decontamination recipe: 13-gram overlap for GPT-3-style filtering;
  * n is a parameter because short synthetic docs need smaller n).
  *
  * Scale shape: the benchmark side is eval sets — thousands of
  * documents, millions of n-grams — so its distinct shingle-hash set
  * is broadcast and the corpus-side scan never shuffles text: each
  * corpus partition explodes its own shingle hashes, semi-joins the
  * broadcast set map-side, and only (id, matched-hash) survivors
  * reach the one aggregation shuffle. Shingles ride as 60-bit md5
  * prefixes (positive longs, engine-portable for the DuckDB oracle;
  * collision probability ~m²·2⁻⁶⁰ — none observable, and the oracle
  * would surface one as a hash mismatch).
  */
object Decontamination {

  /** Distinct word-n-gram hashes per row: tokens are `\S+` runs;
    * rows with fewer than n tokens contribute none.
    */
  private[graft] def shingleHashes(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val shingles = array_distinct(graft.functions.DqFunctions.wordWindows(
      regexp_extract_all(col(textCol), lit("\\S+"), lit(0)), n, minWindows = 0))
    df.select(col(idCol).as("id"), explode(shingles).as("_s"))
      .select(col("id"), Md5Expressions.md5PrefixLong(col("_s"), 15).as("h"))
  }

  /** The benchmark's distinct shingle-hash set — materialize/persist
    * this once per benchmark release and reuse across corpus runs.
    */
  def benchmarkShingles(
      bench: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleHashes(bench, idCol, textCol, n).select(col("h")).distinct()

  /** Per-contaminated-document overlap report: (id, n_shared) where
    * n_shared counts distinct corpus-side n-grams also present in the
    * benchmark set; only rows with n_shared ≥ minOverlap appear.
    */
  def contaminationReport(
      corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int, minOverlap: Long = 1L): DataFrame = {
    val benchSet = benchmarkShingles(bench, idCol, textCol, n)
    shingleHashes(corpus, idCol, textCol, n)
      // corpus-side hashes are distinct per id, so a plain count is
      // the distinct-overlap count; broadcast keeps the join map-side
      .join(broadcast(benchSet), Seq("h"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
      .select(col("id").as(idCol), col("n_shared"))
  }

  /** Drop contaminated documents from the corpus (anti-join against
    * the report — the composable curation-funnel stage).
    */
  def decontaminate(
      corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int, minOverlap: Long = 1L): DataFrame =
    corpus.join(
      contaminationReport(corpus, bench, idCol, textCol, n, minOverlap)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
