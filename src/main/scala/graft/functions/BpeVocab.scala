package graft.functions

/** The embedded byte-pair-encoding merge table — a REAL BPE vocabulary
  * (merge list), not the `bpeishTokenCount` regex approximation, so
  * token budgets, packing, and chunking can be denominated in actual
  * tokens (the reference's counts gate ETL the same way:
  * pre_and_post_etl_checks.py:229-239 — here the gated unit is the
  * token, the currency of a training-data pipeline).
  *
  * Trained once, deterministically, by `tools/train_bpe.py` on the
  * driver-generated public sf0.001 documents corpus and embedded as a
  * literal (the same shared-literal discipline as the p-value grids:
  * ONE Scala constant renders both the engine's rank map and the
  * oracle's `merges` VALUES table, so both engines replay the
  * identical merge loop). Training procedure (stated):
  *
  *  - pre-tokenizer: `[a-z]+|[0-9]+|[^a-z0-9\s]` over lowercased text
  *  - initial symbols: the word's code points (no end-of-word marker)
  *  - each round merges the adjacent pair with the highest corpus
  *    frequency; ties break on the lexicographically smallest pair
  *  - 64 merges (or stop when the best pair count is < 2)
  *
  * Users with a real model vocabulary swap it in per-call: every BPE
  * operator takes a `merges: Seq[(String, String)]` with this table
  * as the default — the merge list IS the vocabulary (apply-time BPE
  * never needs the token id table, only ranks).
  */
object BpeVocab {

  /** Merge list in rank order (rank = index). */
  val default: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("o", "r"),
    ("i", "n"),
    ("o", "w"),
    ("s", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("m", "er"),
    ("a", "t"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("d", "ow"),
    ("in", "dow"),
    ("w", "indow"),
    ("d", "er"),
    ("or", "der"),
    ("or", "t"),
    ("s", "ort"),
    ("par", "t"),
    ("u", "p"),
    ("a", "g"),
    ("ag", "g"),
    ("a", "lu"),
    ("alu", "e"),
    ("v", "alue"),
    ("in", "e"),
    ("l", "ine"),
    ("e", "y"),
    ("k", "ey"),
    ("j", "o"),
    ("jo", "in"),
    ("g", "e"),
    ("mer", "ge"),
    ("er", "y"),
    ("g", "r"),
    ("gr", "o"),
    ("gro", "up"),
    ("q", "u"),
    ("qu", "ery"),
    ("c", "t"),
    ("ct", "or"),
    ("e", "ctor"),
    ("v", "ector"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("l", "ow"),
    ("s", "low"),
    ("a", "m"),
    ("e", "am"),
    ("r", "eam"),
    ("st", "ream"),
    ("f", "i"),
    ("fi", "l"),
    ("fil", "t"),
    ("filt", "er"),
    ("a", "st"),
    ("f", "ast"))

  /** The stated pre-tokenizer, identical (character-class-only, so
    * Java-regex == DuckDB-RE2 semantics) in both engines. */
  val PretokenRegex = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  // ---------------------------------------------------------------
  // Oracle-side rendering: the SAME literal as DuckDB SQL text.
  // ---------------------------------------------------------------

  private def esc(s: String) = s.replace("'", "''")

  /** `merges(pair, merged, rank)` VALUES rows in the delimiter-string
    * form the replay uses: symbols space-joined with a leading and
    * trailing space, so `replace(s, ' a b ', ' ab ')` is exactly the
    * left-to-right non-overlapping merge of the pair (the delimiter
    * spaces keep a pair from matching inside a longer symbol).
    */
  def mergesValuesSql(merges: Seq[(String, String)] = default): String =
    merges.zipWithIndex.map { case ((a, b), i) =>
      s"(' ${esc(a)} ${esc(b)} ', ' ${esc(a + b)} ', $i)"
    }.mkString(",\n      ")

  /** The full DuckDB replay as a WITH-clause body fragment: CTEs
    * `words(doc_id, w)` → distinct-word BPE merge loop → `wtok(w, nt)`
    * → `dtok(doc_id, bpe_tokens, n_words)`. Callers embed it after
    * `WITH RECURSIVE ` and select from `dtok` (per-doc totals) or
    * `words`/`wtok` (per-word counts). The merge loop runs once per
    * DISTINCT word — the oracle-side dictionary trick that keeps the
    * recursion corpus-size-independent.
    */
  def docTokensCtes(merges: Seq[(String, String)] = default,
      table: String = "documents"): String =
    s"""merges(pair, merged, rank) AS (VALUES
       |      ${mergesValuesSql(merges)}),
       |    words AS (
       |      SELECT doc_id, unnest(tk) AS w,
       |        unnest(generate_series(1, len(tk))) AS pos
       |      FROM (SELECT doc_id, regexp_extract_all(lower(text),
       |        '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS tk FROM $table)),
       |    init AS (
       |      SELECT DISTINCT w,
       |        ' ' || array_to_string(regexp_extract_all(w, '.'), ' ') || ' ' AS s
       |      FROM words),
       |    steps(w, s) AS (
       |      SELECT w, s FROM init
       |      UNION ALL
       |      SELECT w, replace(s,
       |          (SELECT m.pair FROM merges m WHERE instr(s, m.pair) > 0
       |           ORDER BY m.rank LIMIT 1),
       |          (SELECT m.merged FROM merges m WHERE instr(s, m.pair) > 0
       |           ORDER BY m.rank LIMIT 1))
       |      FROM steps
       |      WHERE EXISTS (SELECT 1 FROM merges m WHERE instr(s, m.pair) > 0)),
       |    wtok AS (
       |      SELECT w, CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS nt
       |      FROM steps
       |      WHERE NOT EXISTS (SELECT 1 FROM merges m WHERE instr(s, m.pair) > 0)),
       |    dtok AS (
       |      SELECT d.doc_id,
       |        COALESCE(CAST(SUM(wt.nt) AS BIGINT), CAST(0 AS BIGINT)) AS bpe_tokens,
       |        COALESCE(CAST(COUNT(wt.nt) AS BIGINT), CAST(0 AS BIGINT)) AS n_words
       |      FROM $table d
       |      LEFT JOIN words USING (doc_id)
       |      LEFT JOIN wtok wt USING (w)
       |      GROUP BY d.doc_id)""".stripMargin
}
