package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the curation stage that strips
  * emails/phones/identifiers from training text before anything else
  * sees it.
  *
  * Pure per-row expression work (regexp_replace / regexp_extract_all
  * are codegen'd built-ins): no shuffle, no UDF, scales linearly with
  * the scan. Patterns are applied in list order, each replacing ALL
  * its matches, so later patterns see earlier replacements — order
  * matters when patterns overlap (e.g. redact emails before bare
  * domains). Patterns stay in the RE2-compatible subset (character
  * classes, `\d`, `\b`, bounded repetition) so the same pattern text
  * runs identically under Spark's Java regex and RE2-based engines
  * (the DuckDB oracle included).
  */
object Redaction {

  /** A named redaction rule: `regex` matches the PII, `replacement`
    * is the literal placeholder written over each match.
    */
  final case class PiiPattern(name: String, regex: String, replacement: String)

  /** The default rule set; callers compose their own for
    * domain-specific identifiers.
    */
  val defaultPatterns: Seq[PiiPattern] = Seq(
    PiiPattern("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    PiiPattern("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    PiiPattern("id_number", "\\b\\d{9,}\\b", "<ID>"))

  /** Redacted text plus one `n_<name>` match-count column per
    * pattern. Counts are taken on the text as each pattern sees it
    * (i.e. after earlier patterns' replacements), matching what was
    * actually redacted.
    */
  def redactPii(
      df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[PiiPattern] = defaultPatterns): DataFrame = {
    val (redacted, counts) =
      patterns.foldLeft((col(textCol), Vector.empty[Column])) {
        case ((text, acc), p) =>
          val n = size(regexp_extract_all(text, lit(p.regex), lit(0)))
            .cast("bigint").as("n_" + p.name)
          // quoteReplacement: regexp_replace treats '$'/'\' in the
          // replacement as group references — a literal placeholder
          // containing them would expand (or throw) instead of being
          // written verbatim, breaking the PiiPattern contract
          (regexp_replace(text, p.regex,
            java.util.regex.Matcher.quoteReplacement(p.replacement)), acc :+ n)
      }
    df.select(col(idCol) +: redacted.as("text_redacted") +: counts: _*)
  }
}
