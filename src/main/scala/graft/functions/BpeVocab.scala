package graft.functions

/** The embedded byte-pair-encoding merge table — a REAL BPE vocabulary
  * (merge list), not the `bpeishTokenCount` regex approximation, so
  * token budgets, packing, and chunking can be denominated in actual
  * tokens (the reference's counts gate ETL the same way:
  * pre_and_post_etl_checks.py:229-239 — here the gated unit is the
  * token, the currency of a training-data pipeline).
  *
  * Trained once, deterministically, by `tools/train_bpe.py` on the
  * COMBINED driver-generated public sf0.001 text corpus —
  * documents.text plus every other generated VARCHAR surface
  * (part name/brand/type, customer/supplier names and segments,
  * order status/priority, lineitem flags, event types and props,
  * nation/region names) — and embedded as a literal (the same
  * shared-literal discipline as the p-value grids: ONE Scala constant
  * renders both the engine's rank map and the oracle's `merges`
  * VALUES table, so both engines replay the identical merge loop).
  * Training runs to corpus EXHAUSTION (306 merges — the combined
  * corpus's total merge entropy; the stop rule fires when no adjacent
  * pair repeats), which gives the vocabulary a production-shaped
  * profile: high-frequency words are single tokens (fertility 1.0 on
  * the in-distribution documents table — what a deployed tokenizer
  * does to its own training text), out-of-vocabulary words decompose
  * into learned subwords ('quantile' → qu/an/t/i/le, 'windows' →
  * window/s), and digit runs merge pairwise through rank chains up to
  * 7 deep ('furniture' ← furnitu+re ← … — see BpeSpec).
  * Training procedure (stated):
  *
  *  - pre-tokenizer: [[PretokenRegex]] over lowercased text
  *  - initial symbols: the word's code points (no end-of-word marker)
  *  - each round merges the adjacent pair with the highest corpus
  *    frequency; ties break on the lexicographically smallest pair
  *  - stop at 512 merges or when the best pair count is < 2
  *    (this corpus exhausts first, at 306)
  *
  * Users with a real model vocabulary (512–50k merges) swap it in per
  * call: every BPE operator takes a `merges: Seq[(String, String)]`
  * with this table as the default — the merge list IS the vocabulary
  * (apply-time BPE never needs the token id table, only ranks) — and
  * [[fromMergesText]] parses the standard `merges.txt` interchange
  * format. Merge tables must be RANK-WELL-FORMED (each component a
  * single code point or the product of a strictly earlier merge):
  * [[validateMerges]] enforces this at encoder construction, because
  * the oracle's one-lowest-rank-replace-per-step replay and the
  * engine's all-occurrences-per-pass loop agree exactly on
  * well-formed tables but can diverge on ill-ordered ones (e.g.
  * merges [(ab,a),(a,b)] on 'abab': all-occurrence passes give
  * [ab,ab], single-replace gives [aba,b]).
  *
  * Oracle scale note: the DuckDB replay cost is
  * O(distinct words × merge steps × |merges|) — corpus-SIZE-
  * independent thanks to the distinct-word dictionary CTE; measured
  * 0.15 s at sf0.01 with this 306-merge table. A 50k-merge production
  * vocabulary would push the replay to minutes; the documented scale
  * path is a TIERED oracle — full merge-loop replay on a
  * deterministic md5-sampled word slice (hash-exact) plus the
  * engine-census convention on corpus totals — the operator side
  * needs no change.
  */
object BpeVocab {

  /** Merge list in rank order (rank = index). */
  val default: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("o", "r"),
    ("o", "w"),
    ("i", "n"),
    ("s", "t"),
    ("a", "r"),
    ("m", "er"),
    ("l", "u"),
    ("p", "ar"),
    ("a", "t"),
    ("i", "g"),
    ("g", "e"),
    ("e", "c"),
    ("a", "n"),
    ("l", "ow"),
    ("f", "i"),
    ("u", "p"),
    ("c", "h"),
    ("a", "s"),
    ("c", "u"),
    ("cu", "st"),
    ("cust", "o"),
    ("custo", "mer"),
    ("c", "o"),
    ("r", "o"),
    ("r", "e"),
    ("c", "an"),
    ("s", "can"),
    ("co", "lu"),
    ("colu", "m"),
    ("colum", "n"),
    ("m", "a"),
    ("d", "ow"),
    ("in", "dow"),
    ("w", "indow"),
    ("d", "er"),
    ("or", "der"),
    ("or", "t"),
    ("s", "ort"),
    ("lu", "e"),
    ("er", "y"),
    ("par", "t"),
    ("a", "g"),
    ("ag", "g"),
    ("a", "lue"),
    ("v", "alue"),
    ("l", "l"),
    ("ma", "ll"),
    ("s", "mall"),
    ("in", "e"),
    ("l", "ine"),
    ("e", "y"),
    ("k", "ey"),
    ("l", "t"),
    ("j", "o"),
    ("jo", "in"),
    ("mer", "ge"),
    ("g", "ro"),
    ("gro", "up"),
    ("q", "u"),
    ("qu", "ery"),
    ("0", "0"),
    ("ec", "t"),
    ("ect", "or"),
    ("v", "ector"),
    ("l", "e"),
    ("as", "h"),
    ("h", "ash"),
    ("s", "low"),
    ("a", "m"),
    ("re", "am"),
    ("st", "ream"),
    ("fi", "lt"),
    ("filt", "er"),
    ("a", "st"),
    ("f", "ast"),
    ("at", "ch"),
    ("b", "atch"),
    ("h", "e"),
    ("par", "k"),
    ("s", "park"),
    ("t", "he"),
    ("a", "b"),
    ("ab", "le"),
    ("t", "able"),
    ("at", "a"),
    ("d", "ata"),
    ("b", "ig"),
    ("r", "ow"),
    ("e", "d"),
    ("u", "r"),
    ("ed", "i"),
    ("edi", "u"),
    ("ediu", "m"),
    ("m", "edium"),
    ("00", "00"),
    ("n", "o"),
    ("h", "ig"),
    ("hig", "h"),
    ("ec", "i"),
    ("eci", "fi"),
    ("ecifi", "ed"),
    ("no", "t"),
    ("p", "ecified"),
    ("s", "pecified"),
    ("ge", "n"),
    ("gen", "t"),
    ("ur", "gent"),
    ("an", "d"),
    ("l", "i"),
    ("v", "i"),
    ("e", "w"),
    ("c", "k"),
    ("c", "li"),
    ("cli", "ck"),
    ("as", "e"),
    ("ch", "ase"),
    ("p", "ur"),
    ("pur", "chase"),
    ("er", "r"),
    ("err", "or"),
    ("b", "r"),
    ("br", "and"),
    ("ig", "n"),
    ("ign", "up"),
    ("s", "ignup"),
    ("vi", "ew"),
    ("0000", "00"),
    ("l", "d"),
    ("000000", "0"),
    ("m", "o"),
    ("h", "o"),
    ("ar", "ge"),
    ("in", "g"),
    ("l", "arge"),
    ("000000", "1"),
    ("f", "ur"),
    ("fur", "n"),
    ("furn", "i"),
    ("furni", "t"),
    ("furnit", "u"),
    ("furnitu", "re"),
    ("p", "ro"),
    ("pro", "mo"),
    ("ec", "o"),
    ("eco", "no"),
    ("econo", "m"),
    ("econom", "y"),
    ("b", "u"),
    ("bu", "i"),
    ("bui", "ld"),
    ("build", "ing"),
    ("ge", "ar"),
    ("co", "ld"),
    ("ch", "in"),
    ("chin", "ery"),
    ("ma", "chinery"),
    ("an", "vi"),
    ("anvi", "l"),
    ("d", "up"),
    ("and", "ar"),
    ("andar", "d"),
    ("i", "d"),
    ("n", "ew"),
    ("st", "andard"),
    ("ge", "t"),
    ("ho", "t"),
    ("id", "get"),
    ("re", "d"),
    ("w", "idget"),
    ("1", "0"),
    ("1", "9"),
    ("o", "ld"),
    ("ro", "d"),
    ("1", "7"),
    ("at", "i"),
    ("ati", "o"),
    ("atio", "n"),
    ("n", "ation"),
    ("1", "3"),
    ("1", "6"),
    ("b", "o"),
    ("bo", "lt"),
    ("2", "2"),
    ("a", "u"),
    ("au", "t"),
    ("aut", "o"),
    ("auto", "mo"),
    ("automo", "b"),
    ("automob", "i"),
    ("automobi", "le"),
    ("e", "ho"),
    ("eho", "ld"),
    ("ho", "u"),
    ("hou", "s"),
    ("hous", "ehold"),
    ("1", "2"),
    ("1", "4"),
    ("2", "0"),
    ("2", "5"),
    ("2", "6"),
    ("at", "e"),
    ("l", "ate"),
    ("p", "late"),
    ("0000", "0000"),
    ("1", "8"),
    ("2", "1"),
    ("2", "3"),
    ("b", "lue"),
    ("r", "ing"),
    ("1", "1"),
    ("1", "5"),
    ("g", "i"),
    ("gi", "z"),
    ("giz", "mo"),
    ("2", "4"),
    ("7", "6"),
    ("4", "1"),
    ("4", "6"),
    ("5", "1"),
    ("5", "3"),
    ("3", "3"),
    ("3", "7"),
    ("6", "2"),
    ("8", "0"),
    ("4", "9"),
    ("5", "0"),
    ("6", "0"),
    ("6", "1"),
    ("7", "8"),
    ("9", "0"),
    ("2", "9"),
    ("3", "0"),
    ("3", "1"),
    ("3", "5"),
    ("3", "8"),
    ("3", "9"),
    ("4", "7"),
    ("5", "8"),
    ("6", "9"),
    ("8", "7"),
    ("9", "4"),
    ("4", "3"),
    ("6", "7"),
    ("6", "8"),
    ("7", "7"),
    ("8", "1"),
    ("8", "3"),
    ("8", "6"),
    ("8", "8"),
    ("9", "2"),
    ("9", "3"),
    ("2", "7"),
    ("5", "4"),
    ("6", "3"),
    ("7", "1"),
    ("8", "2"),
    ("9", "1"),
    ("3", "4"),
    ("4", "0"),
    ("5", "2"),
    ("5", "9"),
    ("7", "2"),
    ("8", "5"),
    ("9", "5"),
    ("li", "er"),
    ("p", "lier"),
    ("s", "up"),
    ("sup", "plier"),
    ("0000001", "0"),
    ("3", "6"),
    ("4", "2"),
    ("4", "4"),
    ("6", "4"),
    ("7", "3"),
    ("8", "9"),
    ("9", "9"),
    ("2", "8"),
    ("4", "5"),
    ("4", "8"),
    ("5", "5"),
    ("5", "6"),
    ("6", "5"),
    ("6", "6"),
    ("7", "0"),
    ("7", "9"),
    ("8", "4"),
    ("9", "7"),
    ("9", "8"),
    ("5", "7"),
    ("3", "2"),
    ("7", "4"),
    ("7", "5"),
    ("9", "6"),
    ("00000000", "0"),
    ("00000000", "1"),
    ("00000000", "2"),
    ("00000000", "3"),
    ("00000000", "4"),
    ("00000000", "5"),
    ("00000000", "6"),
    ("00000000", "7"),
    ("00000000", "8"),
    ("00000000", "9"),
    ("c", "a"),
    ("i", "ca"))

  /** The PRODUCTION-SCALE vocabulary: 1956 merges, trained by
    * `tools/train_bpe.py` to corpus exhaustion on the combined
    * public sf0.1 text surfaces (15,187 distinct pre-tokens — the
    * 100×-larger corpus whose entity names, digit runs, and JSON
    * props sustain a table past the 1k-merge production bar), shipped
    * as the standard `merges.txt` interchange file
    * (`/graft/merges.txt` on the classpath) and loaded through
    * [[fromMergesText]] — i.e. the exact path a user with a real
    * model vocabulary exercises, validation included. The token
    * family (q181–q184, q187, q192–q197) is denominated in THIS
    * table; [[default]] remains the embedded 306-merge sf0.001
    * exhaustion table (operator default args, q188's
    * out-of-distribution fertility probe, and the spec corpus).
    *
    * Oracle cost at this size, measured at sf0.01: the full-replay
    * recursive CTE stays sub-second for documents-denominated
    * queries because replay is DISTINCT-WORD-bounded (31 words) —
    * |merges| multiplies the per-step scan, not the step count. The
    * tiered md5-word-slice oracle (q192, `wordPredicate`) remains
    * the documented path for corpora whose distinct-word census ×
    * |merges| outgrows that.
    */
  lazy val production: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/merges.txt")
    require(in != null, "classpath resource /graft/merges.txt is missing")
    try fromMergesText(
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** The LARGE demonstration vocabulary: 15,971 merges — the same
    * combined sf0.1 corpus trained under the standard production
    * stop-at-vocab-size convention (`tools/train_bpe_fast.py` with
    * min pair count 1) to FULL-VOCABULARY exhaustion: every one of
    * the 15,187 distinct corpus pre-tokens merges to a single token,
    * so no further merge is derivable from the public corpus — the
    * hard ceiling of a zero-egress sandbox, 8.2× [[production]] and
    * at the foot of the realistic 16k–50k band. Shipped as a second
    * standard interchange file (`/graft/merges_large.txt`) and loaded
    * through the SAME [[fromMergesText]] + [[validateMerges]] path,
    * demonstrating the loader and the q192 tiered-oracle convention
    * at production |merges| (q205/q206). [[production]] stays the
    * token family's denomination: re-denominating every oracle to a
    * 16k-row VALUES replay would multiply the whole Verify budget
    * for no additional coverage.
    */
  lazy val large: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/merges_large.txt")
    require(in != null, "classpath resource /graft/merges_large.txt is missing")
    try fromMergesText(
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** The stated pre-tokenizer, identical in both engines. Character
    * classes only, with the whitespace set SPELLED OUT — Java's `\s`
    * and RE2's `\s` disagree on vertical tab (U+000B), so the shared
    * literal names the exact characters and both engines compile the
    * identical class. */
  val PretokenRegex = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]"

  /** Enforce rank-well-formedness: every merge component is a single
    * code point or the concatenation produced by a STRICTLY EARLIER
    * merge, no component contains a space (the pair-key/oracle
    * delimiter), and no pair is listed twice. This is the precondition
    * under which the engine's all-occurrences-per-pass loop and the
    * oracle's lowest-rank-replace replay provably tokenize
    * identically; tables that violate it are refused loudly instead
    * of diverging silently.
    */
  def validateMerges(merges: Seq[(String, String)]): Unit = {
    val produced = new java.util.HashSet[String]()
    val seen = new java.util.HashSet[String]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      def derivable(s: String): Boolean =
        (s.nonEmpty && s.codePointCount(0, s.length) == 1) || produced.contains(s)
      require(!a.contains(' ') && !b.contains(' '),
        s"merge $i ('$a', '$b'): symbols must not contain spaces " +
          "(the pre-tokenizer never emits them; space is the pair-key delimiter)")
      require(derivable(a) && derivable(b),
        s"merge $i ('$a', '$b') is not rank-well-formed: each component " +
          "must be a single code point or the product of an earlier merge")
      require(seen.add(a + " " + b),
        s"merge $i ('$a', '$b') duplicates an earlier pair — ranks would be ambiguous")
      produced.add(a + b)
    }
  }

  /** Parse the standard BPE `merges.txt` interchange format (the
    * GPT-2 lineage: optional `#version` header line, then one
    * `left right` pair per line, rank = line order) — the loader a
    * user with a REAL tokenizer vocabulary points at their model's
    * merge file. Blank lines are skipped; the table is
    * [[validateMerges]]-checked before use.
    */
  def fromMergesText(text: String): Seq[(String, String)] = {
    val lines = text.linesIterator.zipWithIndex
      .filterNot { case (l, i) => (i == 0 && l.startsWith("#version")) || l.trim.isEmpty }
      .map { case (l, i) =>
        l.split(" ", -1) match {
          case Array(a, b) if a.nonEmpty && b.nonEmpty => (a, b)
          case _ => throw new IllegalArgumentException(
            s"merges.txt line ${i + 1}: expected 'left right', got '$l'")
        }
      }.toSeq
    validateMerges(lines)
    lines
  }

  // ---------------------------------------------------------------
  // Oracle-side rendering: the SAME literal as DuckDB SQL text.
  // ---------------------------------------------------------------

  private def esc(s: String) = s.replace("'", "''")

  /** `merges(pair, merged, rank)` VALUES rows in the delimiter-string
    * form the replay uses. The replay string keeps TWO spaces at every
    * symbol boundary (and at both ends); the pattern ` a  b ` and
    * replacement ` ab ` are single-space-padded. Each match therefore
    * consumes ONE space from each flanking boundary and the
    * replacement restores it — so `replace()`'s left-to-right
    * non-overlapping scan pairs a run of identical symbols
    * (0 0 0 0 → 00 00) exactly like the engine's merge pass. A
    * single-space representation gets this wrong: consecutive
    * occurrences share the delimiter space, so ` 0 0 ` can only match
    * every OTHER pair in a run — invisible on the old word-only
    * vocabulary, measurably wrong on digit runs (q188).
    */
  def mergesValuesSql(merges: Seq[(String, String)] = default): String =
    merges.zipWithIndex.map { case ((a, b), i) =>
      s"(' ${esc(a)}  ${esc(b)} ', ' ${esc(a + b)} ', $i)"
    }.mkString(",\n      ")

  /** The full DuckDB replay as a WITH-clause body fragment: CTEs
    * `words(doc_id, w)` → distinct-word BPE merge loop → `wtok(w, nt)`
    * → `dtok(doc_id, bpe_tokens, n_words)`. Callers embed it after
    * `WITH RECURSIVE ` and select from `dtok` (per-doc totals) or
    * `words`/`wtok` (per-word counts). The merge loop runs once per
    * DISTINCT word — the oracle-side dictionary trick that keeps the
    * recursion corpus-size-independent. `table` may be any relation
    * expression with (doc_id, text) columns, including a
    * parenthesized subquery.
    *
    * `wordPredicate` (a SQL predicate over the word column `w`)
    * restricts the MERGE-LOOP REPLAY to a word slice — the TIERED
    * oracle for production-size vocabularies: replay cost is
    * O(replayed words × steps × |merges|), so a deterministic
    * md5-sampled slice keeps a 50k-merge table's oracle tractable
    * while staying hash-exact on the sampled surface (q192). With a
    * non-default predicate only `wtok` rows for matching words exist;
    * `dtok` is meaningful only under the default TRUE predicate.
    */
  def docTokensCtes(merges: Seq[(String, String)] = default,
      table: String = "documents", wordPredicate: String = "TRUE"): String = {
    validateMerges(merges)
    s"""merges(pair, merged, rank) AS (VALUES
       |      ${mergesValuesSql(merges)}),
       |    words AS (
       |      SELECT doc_id, unnest(tk) AS w,
       |        unnest(generate_series(1, len(tk))) AS pos
       |      FROM (SELECT doc_id, regexp_extract_all(lower(text),
       |        '$PretokenRegex') AS tk FROM $table)),
       |    init AS (
       |      SELECT DISTINCT w,
       |        '  ' || array_to_string(regexp_extract_all(w, '.'), '  ') || '  ' AS s
       |      FROM words WHERE $wordPredicate),
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
       |      SELECT w, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS nt
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
}
