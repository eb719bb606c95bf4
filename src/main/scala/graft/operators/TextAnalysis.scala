package graft.operators

import graft.AdaptiveCache.CensusPersist
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DqFunctions._

/** Text-analysis operators for training-data pipelines: language ID
  * (n-gram/stopword heuristic), quality scoring, token counting, and
  * document fingerprinting. All per-row built-in expressions — no
  * UDFs, no shuffle; aggregation variants shuffle only the tiny
  * per-group summaries.
  */
object TextAnalysis {

  /** Language marker words with weights — a tiny stopword-frequency
    * heuristic (real pipelines use fastText-style models; the engine
    * keeps the deterministic heuristic as the no-dependency default).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "es" -> Seq(" el ", " de ", " la ", " es "),
    "fr" -> Seq(" le ", " la ", " et ", " est "),
    "zh" -> Seq("的", "是", "了", "在"))

  /** Occurrences of a literal substring (no regex — identical
    * semantics in any engine): (len(s) − len(replace(s, m))) / len(m).
    */
  def substringCount(text: Column, marker: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(marker), "")))
      / marker.length).cast("int")

  /** Per-language marker score: total marker occurrences. */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(substringCount(text, _)).reduce(_ + _)

  /** Predicted language: argmax of marker scores, first-listed wins
    * ties, "und" (undetermined) when no marker hits. Pads the text
    * with spaces so edge words match the space-delimited markers.
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    // argmax via array_max over (score, rank, lang) structs — each
    // language's score is stated (and codegen'd) exactly ONCE. The
    // previous when-chain spelling re-inlined every score into every
    // branch (s_i === greatest(s_1..s_L) per language), which blew the
    // fused curate/streaming-curation stages past Janino's 64 KB
    // method limit and silently dropped them to interpreted execution.
    // rank descends with list position, so equal scores resolve to the
    // first-listed language — the original tie rule; the lang field is
    // never reached by the comparison (rank is unique).
    val scored = array(LangMarkers.zipWithIndex.map { case ((lang, ms), i) =>
      struct(langScore(padded, ms).as("s"),
        lit(LangMarkers.length - i).as("r"), lit(lang).as("lang"))
    }: _*)
    val best = array_max(scored)
    when(best.getField("s") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality features: lengths, token counts, ratios, and a blended
    * 0..1 quality score (length-normalized, punctuation-penalized,
    * stopword-informed) — the usual cheap pre-filter before model-
    * based quality scoring.
    */
  def qualityFeatures(
      df: DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nTokens = tokenCount(t)
    val nPunct = length(t) - length(regexp_replace(t, "[.,;:!?]", ""))
    val nStop = langScore(concat(lit(" "), t, lit(" ")),
      Seq(" the ", " a ", " and ", " of ", " is ", " in "))
    val meanWordLen = when(nTokens > 0,
      length(regexp_replace(t, "\\s+", "")).cast("double") / nTokens.cast("double"))
      .otherwise(lit(0.0))
    // unsplittable-input spread before the regex-heavy feature
    // projection (guide §2.5; no-op on parallel/post-shuffle input)
    graft.ParallelSpread.forCpu(df, col(idCol)).select(
      (Seq(
        col(idCol),
        nChars.cast("bigint").as("n_chars"),
        nTokens.cast("bigint").as("n_tokens"),
        bpeishTokenCount(t).cast("bigint").as("n_bpeish_tokens"),
        nPunct.cast("bigint").as("n_punct"),
        when(nChars > 0, nPunct.cast("double") / nChars.cast("double"))
          .otherwise(lit(0.0)).as("punct_ratio"),
        when(nTokens > 0, nStop.cast("double") / nTokens.cast("double"))
          .otherwise(lit(0.0)).as("stopword_ratio"),
        meanWordLen.as("mean_word_len")) ++ carry.map(col)): _*)
  }

  /** The inference half of a fasttext-style LINEAR quality
    * classifier over the [[qualityFeatures]] surface: logit = bias +
    * w·f, entirely codegen'd column arithmetic — no model runtime,
    * no UDF, no shuffle; at 100 TB the gate costs exactly one
    * feature scan. Weights come from any offline trainer (logistic
    * regression on a labeled quality sample); this operator is the
    * deploy path that keeps scoring inside whole-stage codegen.
    *
    * The logit is reported raw, not sigmoid'd: the decision boundary
    * only needs its sign, ordering only needs monotonicity, and
    * keeping `exp` out of the hashed surface keeps the score
    * engine-portable (the transcendental-ulp rule). Character volume
    * enters as n_chars/1024 — a power-of-two scaling, exact in IEEE
    * — so the weight magnitudes stay comparable. The fixed
    * left-to-right sum order makes the double arithmetic
    * bit-reproducible on any engine stating the same expression.
    */
  def linearQualityScore(
      df: DataFrame, idCol: String, textCol: String,
      bias: Double, wStopword: Double, wPunct: Double,
      wMeanWordLen: Double, wKChars: Double,
      threshold: Double = 0.0,
      carry: Seq[String] = Nil): DataFrame =
    qualityFeatures(df, idCol, textCol, carry)
      .select(
        (Seq(col(idCol),
          (lit(bias)
            + lit(wStopword) * col("stopword_ratio")
            + lit(wPunct) * col("punct_ratio")
            + lit(wMeanWordLen) * col("mean_word_len")
            + lit(wKChars) * (col("n_chars").cast("double") / lit(1024.0)))
            .as("logit")) ++ carry.map(col)): _*)
      .withColumn("keep", col("logit") > lit(threshold))

  /** Per-group token statistics (e.g. per language or per source):
    * docs, token sums, mean doc length. Partial aggregation at the
    * scan; only per-group partials shuffle.
    */
  def tokenStats(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("bigint")).as("total_tokens"),
        sum(bpeishTokenCount(col(textCol)).cast("bigint")).as("total_bpeish_tokens"),
        sum(length(col(textCol)).cast("bigint")).as("total_chars"))

  /** Repetition signals (the Gopher/C4-style quality filters):
    * documents dominated by repeated lines or a single over-frequent
    * word are boilerplate/spam candidates.
    *
    *  - dup_line_frac: 1 − distinct lines / lines ('\n'-split);
    *  - top_word_frac: occurrences of the most frequent whitespace
    *    token / total tokens;
    *  - dup_ngram_frac: 1 − distinct word bigrams / word bigrams.
    *
    * All per-row HOF expressions (no shuffle); the top-word pass is
    * O(distinct·tokens) per row — fine for documents, and the whole
    * computation stays engine-portable for the oracle.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        graft.functions.RepetitionExpression
          .repetitionSignals(col(textCol)).as("r"))
      .select(col(idCol), col("r.n_lines"), col("r.dup_line_frac"),
        col("r.top_word_frac"), col("r.dup_bigram_frac"))

  /** The compositional plan the native expression replaces (three
    * regex passes + an explode→two-level-agg shuffle for the top
    * word); kept as the value-equality pin for
    * [[graft.functions.RepetitionSignals]].
    */
  private[graft] def repetitionSignalsComposed(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n")
    val toks = regexp_extract_all(t, lit("\\S+"), lit(0))
    val bigrams = wordShinglesWithDups(t, 2)
    val perRow = df.select(
      col(idCol),
      size(lines).cast("bigint").as("n_lines"),
      (lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines).cast("double"))
        .as("dup_line_frac"),
      size(toks).cast("bigint").as("_n_toks"),
      when(size(bigrams) > 0,
        lit(1.0) - size(array_distinct(bigrams)).cast("double") / size(bigrams).cast("double"))
        .otherwise(lit(0.0)).as("dup_bigram_frac"))
    // Top-word multiplicity via explode + two-level aggregation:
    // linear in tokens and shuffles only (id, token-hash) partials —
    // the per-row HOF alternative (count each distinct token by
    // rescanning the array) is O(distinct·tokens) per row, quadratic
    // on exactly the giant repetitive documents this filter exists to
    // catch. Tokens ride as 64-bit hashes (multiplicities unchanged).
    val top = df.select(col(idCol).as("_tid"),
        explode(regexp_extract_all(t, lit("\\S+"), lit(0))).as("_w"))
      .select(col("_tid"), xxhash64(col("_w")).as("_wh"))
      .groupBy("_tid", "_wh").agg(count(lit(1)).as("_c"))
      .groupBy("_tid").agg(max(col("_c")).as("_top"))
    perRow
      .join(top, perRow(idCol) === top("_tid"), "left")
      .withColumn("top_word_frac",
        when(col("_n_toks") > 0,
          coalesce(col("_top"), lit(0L)).cast("double") / col("_n_toks").cast("double"))
          .otherwise(lit(0.0)))
      .select(col(idCol), col("n_lines"), col("dup_line_frac"),
        col("top_word_frac"), col("dup_bigram_frac"))
  }

  /** Word n-grams WITH duplicates preserved (repetition analysis
    * needs multiplicity; [[graft.functions.DqFunctions.wordShingles]]
    * deduplicates for set similarity). Empty/whitespace text → empty.
    */
  private[graft] def wordShinglesWithDups(text: Column, n: Int): Column =
    graft.functions.DqFunctions.wordWindows(
      regexp_extract_all(text, lit("\\S+"), lit(0)), n, minWindows = 0)

  /** Per-group EXACT token-count quantiles (p50/p90/p99): the
    * length-distribution drift signal. Exact `percentile` (linear
    * interpolation at p·(n−1)) matches DuckDB's quantile_cont, so
    * the result is oracle-checkable; at warehouse scale swap in
    * percentile_approx and drop the oracle to rows-only.
    */
  def tokenQuantiles(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.select(col(groupCol), tokenCount(col(textCol)).as("_n"))
      .groupBy(col(groupCol))
      .agg(
        expr("percentile(_n, 0.5)").as("p50_tokens"),
        expr("percentile(_n, 0.9)").as("p90_tokens"),
        expr("percentile(_n, 0.99)").as("p99_tokens"))

  /** Corpus-frequency quality proxy (the perplexity-filter shape
    * without a model): per document, the mean corpus occurrence count
    * over its token occurrences. Boilerplate/template docs — built
    * from tokens the corpus repeats constantly — score high;
    * rare-vocabulary docs score low. Integer sums + one double
    * division keep it engine-exact (a log-prob variant would hang
    * parity on libm rounding).
    *
    * Shape: token explode → global dictionary aggregate → join back →
    * per-doc mean. The dictionary join is the TF-IDF precursor; at
    * 100 TB the dictionary is a materialized table and the join
    * shuffles (hash, count) pairs only. Zero-token documents have no
    * occurrences and drop out (consistent with the SQL mirror).
    */
  def tokenRarity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = df.select(col(idCol).as("id"),
        explode(regexp_extract_all(col(textCol), lit("\\S+"), lit(0))).as("_w"))
      .select(col("id"), xxhash64(col("_w")).as("_wh"))
    val freq = tk.groupBy("_wh").agg(count(lit(1)).as("_cf"))
    tk.join(freq, "_wh")
      .groupBy(col("id"))
      .agg(
        (sum(col("_cf")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_token_freq"),
        count(lit(1)).as("n_tokens"))
  }

  /** Document fingerprints: sha256 of whitespace-normalized lowercase
    * text (content-defined, engine-portable) plus a cheap 64-bit
    * xxhash for in-engine joins.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      contentFingerprint(col(textCol)).as("sha256_fingerprint"),
      xxhash64(normalizedText(col(textCol))).as("hash64"))

  /** TF-IDF keyword extraction: the top-`k` terms of each document by
    * tf·idf, with deterministic (score desc, term asc) ranking.
    *
    * Terms are lowercase alphanumeric runs (`[a-z0-9]+` over the
    * lowercased text — punctuation-stripped, unlike the `\S+` token
    * statistics, because keywords shouldn't differ by trailing
    * commas). The idf factor is the plain ratio N/df — the
    * [[Retrieval]] idiom: every operation stays IEEE +,*,/ with fixed
    * association, so scores are bit-reproducible across engines
    * (transcendental log is the one thing two engines won't agree on
    * to the ulp). Ranking is the same monotone-in-rarity shape.
    *
    * Plan shape: explode → (doc, term) count [one shuffle, map-side
    * combine] → per-term document frequency [second shuffle; hot
    * stopword terms are fine because partial counts combine at the
    * scan] → join back keyed on term → per-document top-k window.
    * The per-document window partitions by doc id, bounded by a
    * document's distinct-term count — no Zipfian hot key is possible
    * (contrast per-GROUP top-k, which [[Sampling.capPerGroup]] salts).
    * At warehouse scale the (term, df) dictionary is a maintained
    * table and the join shuffles (term, count) pairs only.
    */
  def tfidfKeywords(
      df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    require(k >= 1, "k must be positive")
    val tk = df.select(col(idCol).as("id"),
      explode(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("term"))
    // tf feeds BOTH the df dictionary and the scoring join; persist so
    // the explode+count runs once. Released after first use.
    val tf = tk.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf")).persistCensus()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("_dft"))
    val n = df.agg(count(lit(1)).as("_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("term").asc)
    val out = tf.join(dfreq, "term").crossJoin(n)
      .withColumn("score",
        col("tf").cast("double") * col("_n").cast("double") / col("_dft").cast("double"))
      .withColumn("kw_rank", row_number().over(w).cast("bigint"))
      .filter(col("kw_rank") <= k)
      .select(col("id").as(idCol), col("term"), col("tf"), col("score"), col("kw_rank"))
    graft.CacheLifecycle.releaseAfterFirstUse(Seq(tf))
    out
  }

  /** Overlapping token-window chunking — the training/RAG context-
    * window layout: each document becomes chunks of `chunkTokens`
    * whitespace tokens starting every `stride` tokens, rejoined with
    * single spaces (whitespace-lossy by construction; chunk
    * boundaries, not byte fidelity, are the contract).
    *
    * Chunk starts are the 1-based grid {1, 1+stride, …}; a start
    * whose chunk would be fully contained in the previous chunk is
    * dropped (s > n − chunkTokens + stride), so the final chunk is
    * the one that reaches the end, never a redundant tail sliver.
    * Coverage is total: the largest kept start exceeds n − chunkTokens
    * (grid step = stride ≤ chunkTokens), so every token appears in at
    * least one chunk — pinned by spec. Documents with zero tokens
    * produce zero chunks.
    *
    * Pure per-row expression work plus the explode — no shuffle at
    * all; chunking 100 TB is a map-only pass that parallelizes with
    * the scan. `chunk_idx` = (start−1)/stride is derivable from the
    * grid, so no ordinality bookkeeping rides the explode.
    */
  def chunkByTokens(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 64, stride: Int = 48): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be positive")
    require(stride >= 1 && stride <= chunkTokens,
      "stride must be in [1, chunkTokens]")
    val keepTail = chunkTokens - stride
    val withTk = df
      .select(col(idCol), regexp_extract_all(col(textCol), lit("\\S+"), lit(0)).as("_tk"))
      .filter(size(col("_tk")) > 0)
    val starts = filter(
      sequence(lit(1), size(col("_tk")), lit(stride)),
      s => (s === 1) || (s <= size(col("_tk")) - keepTail))
    withTk.select(col(idCol), col("_tk"), explode(starts).as("_s"))
      .select(
        col(idCol),
        ((col("_s") - 1) / stride).cast("bigint").as("chunk_idx"),
        array_join(slice(col("_tk"), col("_s"), lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens), size(col("_tk")) - col("_s") + 1).cast("bigint")
          .as("n_tokens"))
  }

  /** Budget chunking in REAL tokens: split each document at word
    * boundaries into chunks of ≈`budgetTokens` BPE tokens (the unit a
    * context window is actually denominated in), instead of
    * [[chunkByTokens]]'s fixed word windows. A word lands in chunk
    * `floor(tokens_before_it / budget)` — chunks fill to the budget
    * and spill the boundary word to the next chunk, so every chunk
    * except a document's last holds ≥ budget − (max word tokens − 1)
    * and < budget + max word tokens.
    *
    * 100 TB: map-only explode + a per-document window (documents are
    * bounded, so the partition-by-doc window never concentrates) +
    * one (doc, chunk) hash aggregate. The BPE count rides the
    * codegen'd [[graft.functions.BpeTokenCount]] expression computed
    * ONCE per word in the post-explode projection.
    */
  def chunkByTokenBudget(
      df: DataFrame, idCol: String, textCol: String, budgetTokens: Int,
      merges: Seq[(String, String)] = graft.functions.BpeVocab.default): DataFrame = {
    require(budgetTokens >= 1, "budgetTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val words = df
      .select(col(idCol), posexplode(regexp_extract_all(
        lower(col(textCol)),
        lit(graft.functions.BpeVocab.PretokenRegex), lit(0))))
      .select(col(idCol), col("pos").as("_pos"), col("col").as("_w"))
      .withColumn("_nt",
        graft.functions.Bpe.bpeTokenCount(col("_w"), merges).cast("long"))
    val wCum = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    words
      .withColumn("chunk_idx",
        floor(coalesce(sum(col("_nt")).over(wCum), lit(0L))
          / lit(budgetTokens.toLong)).cast("bigint"))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("_nt")).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("_pos").as("p"), col("_w").as("w")))),
          s => s.getField("w")), " ").as("chunk_text"))
  }

  /** Per-group token-DIVERSITY census with EXACT fixed-point Shannon
    * entropy: a templated or spammy source shows up as low entropy /
    * low type–token ratio long before a human reads it — the
    * corpus-composition signal next to the quality (q112) and
    * perplexity (q185) gates.
    *
    * Entropy over the group's BPE-token distribution, kept on the
    * hashed oracle surface by the [[graft.functions.FixedPointLog]]
    * device (the no-transcendental rule): with token counts c_w and
    * N = Σc_w,  H = log2 N − (Σ c_w·log2 c_w)/N — every log2 is the
    * exact Q16 integer dag, the Σ c·lg(c) accumulates in
    * DECIMAL(38,0) (order-free, wrap-proof past 100 TB token counts),
    * and only the final displayed divisions are doubles with the dag
    * stated identically in both engines. `normalized_entropy` is
    * H / log2 V (NULL when V = 1 — a single-token distribution has no
    * scale to normalize by).
    *
    * Scale shape: explode → one (group, token) hash aggregate (the
    * q187 census) → one group aggregate; map-side partials bound the
    * shuffle by distinct (group, token) pairs. Rows with NULL group
    * or text are excluded (stated).
    */
  /** The (group, token) → count census shared by [[tokenEntropyBy]]
    * and [[zipfSlopeBy]]: explode → one hash aggregate, shuffle
    * bounded by distinct (group, token) pairs. */
  private def tokenCountCensus(
      df: DataFrame, group: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame =
    df.filter(group.isNotNull && text.isNotNull)
      .select(group.as("group_key"),
        explode(graft.functions.Bpe.bpeTokens(text, merges)).as("_t"))
      .groupBy(col("group_key"), col("_t"))
      .agg(count(lit(1)).as("_c"))

  def tokenEntropyBy(
      df: DataFrame, group: Column, text: Column,
      merges: Seq[(String, String)] = graft.functions.BpeVocab.default): DataFrame =
    entropyFromCounts(tokenCountCensus(df, group, text, merges))

  /** [[tokenEntropyBy]] rebuilt from a MAINTAINED vocabulary census —
    * the partials-log discipline on the diversity surface (the
    * sweepFromBandCensus / mixturePlanFromTokenCensus analog): fold
    * the mergeable (group_key, token, n) integer partials a standing
    * census emits
    * ([[graft.streaming.StreamingCuration.windowedVocabCensus]]'s
    * sink, or any append log) and run the identical entropy dag. The
    * Q16 logs are taken AFTER the fold, on exact totals, so partials
    * at any granularity fold to the same table — streamed == batch
    * exactly, spec-pinned.
    */
  def tokenEntropyFromCensus(censusLog: DataFrame): DataFrame =
    entropyFromCounts(
      censusLog.select(col("group_key"), col("token").as("_t"), col("n"))
        .groupBy(col("group_key"), col("_t"))
        .agg(sum(col("n")).as("_c")))

  /** Per-group tokenizer COMPRESSION RATIO — UTF-8 bytes per BPE
    * token, THE standard metric a tokenizer swap is judged on (the
    * q202 surface). Batch form: per-doc integer partials (n_docs=1,
    * tokens, bytes) folded through [[compressionFromCensus]] — the
    * SAME dag as the maintained form, so the two can never drift
    * (the mixturePlanFromTotals discipline). Rows with a NULL group
    * or NULL text are excluded (stated — and the exclusion the
    * streaming census applies, so maintained == batch exactly).
    */
  def tokenizerCompressionBy(
      df: DataFrame, group: Column, text: Column,
      merges: Seq[(String, String)] = graft.functions.BpeVocab.default): DataFrame =
    compressionFromCensus(
      df.filter(group.isNotNull && text.isNotNull)
        .select(group.as("group_key"), lit(1L).as("n_docs"),
          graft.functions.Bpe.bpeTokenCount(text, merges)
            .cast("long").as("total_tokens"),
          octet_length(text).cast("long").as("total_bytes")))

  /** The fold half shared by [[tokenizerCompressionBy]] and the
    * MAINTAINED form — the partials-log discipline on the compression
    * surface: fold the mergeable (group_key, n_docs, total_tokens,
    * total_bytes) integer rows
    * ([[graft.streaming.StreamingCuration.windowedTokenCensus]]'s
    * sink, a nightly append table, per-doc batch partials, or any
    * union of them) and divide ONCE on the exact totals. Partials at
    * any granularity fold to the same table (integer sums are
    * order-free; the single double division happens AFTER the fold),
    * so streamed == batch exactly. Output: (group_key, n_docs,
    * total_bytes, total_bpe_tokens, bytes_per_token — NULL when the
    * token total is 0).
    */
  def compressionFromCensus(censusLog: DataFrame): DataFrame = {
    val toks = sum(col("total_tokens"))
    val bytes = sum(col("total_bytes"))
    censusLog
      .select(col("group_key"), col("n_docs"),
        col("total_tokens"), col("total_bytes"))
      .groupBy(col("group_key"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        bytes.as("total_bytes"),
        toks.as("total_bpe_tokens"),
        when(toks > 0L, bytes.cast("double") / toks.cast("double"))
          .as("bytes_per_token"))
  }

  /** The exact-Q16 entropy back half shared by [[tokenEntropyBy]] and
    * [[tokenEntropyFromCensus]] over a (group_key, _t, _c) census —
    * one arithmetic path, so the batch and maintained forms can never
    * drift. */
  private def entropyFromCounts(counts: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val per = counts.groupBy(col("group_key"))
      .agg(
        sum(col("_c")).as("n_tokens"),
        count(lit(1)).as("distinct_tokens"),
        sum(dec(col("_c")) * dec(graft.functions.Log2FpQ16(col("_c"))))
          .cast("decimal(38,0)").as("_s"))
    val entropy =
      (graft.functions.Log2FpQ16(col("n_tokens")).cast("double") / lit(65536.0)) -
        (col("_s").cast("double") / (lit(65536.0) * col("n_tokens").cast("double")))
    per
      .select(col("group_key"), col("n_tokens"), col("distinct_tokens"),
        (col("distinct_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("type_token_ratio"),
        entropy.as("entropy_bits"))
      .withColumn("normalized_entropy",
        when(col("distinct_tokens") > 1L,
          col("entropy_bits") /
            (graft.functions.Log2FpQ16(col("distinct_tokens")).cast("double")
              / lit(65536.0))))
  }

  /** Per-group Zipf rank–frequency slope — the SHAPE companion to
    * [[tokenEntropyBy]]'s diversity level: natural text reads near
    * slope −1 on the log–log rank/frequency plot; templated or
    * machine-generated sources bend far from it. Robust fit =
    * Theil–Sen (median of pairwise slopes) over the TOP-`k` ranks by
    * count (the head is where the Zipf law lives, and k bounds the
    * per-group pair census at k²/2 however large the vocabulary —
    * the maxBuckets discipline without a crash path).
    *
    * Portability: both axes are the EXACT Q16 log₂ dag
    * ([[graft.functions.FixedPointLog]]) of exact integers (count,
    * rank), so every pairwise slope is one double division of two
    * exact integer deltas, and the median is the same
    * percentile/quantile_cont interpolation the Theil–Sen trend
    * operator already hash-matches. Rank ties break on the token
    * string (deterministic); pairs whose Q16 rank-logs collide
    * (possible only at ranks ≫ 2¹⁶) are excluded, stated. Output:
    * (group_key, n_distinct_tokens, n_head, n_pairs, zipf_slope,
    * slope_min, slope_max).
    */
  def zipfSlopeBy(
      df: DataFrame, group: Column, text: Column, k: Int = 256,
      merges: Seq[(String, String)] = graft.functions.BpeVocab.default): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val counts = tokenCountCensus(df, group, text, merges).persistCensus()
    val v = counts.groupBy(col("group_key"))
      .agg(count(lit(1)).as("n_distinct_tokens"))
    // head extraction is the salted two-phase top-k (the shared
    // Sampling.saltedTopK core): a single per-group window would sort
    // a web-scale source's full distinct-token census (10⁸ rows) in
    // one task. Exact under the (_c desc, _t asc) total order.
    val head = Sampling.saltedTopK(counts, Seq(col("group_key")), col("_t"),
        Seq(col("_c").desc, col("_t").asc), k, salts = 32, rankName = "_r")
      .select(col("group_key"), col("_r"),
        graft.functions.Log2FpQ16(col("_r")).as("_lgr"),
        graft.functions.Log2FpQ16(col("_c")).as("_lgc"))
    val l = head.select(col("group_key"), col("_r").as("_r1"),
      col("_lgr").as("_lgr1"), col("_lgc").as("_lgc1"))
    val r = head.select(col("group_key").as("_g2"), col("_r").as("_r2"),
      col("_lgr").as("_lgr2"), col("_lgc").as("_lgc2"))
    val slopes = l.join(r, col("group_key") === col("_g2") && col("_r1") < col("_r2"))
      .filter(col("_lgr2") =!= col("_lgr1"))
      .select(col("group_key"),
        ((col("_lgc2") - col("_lgc1")).cast("double")
          / (col("_lgr2") - col("_lgr1")).cast("double")).as("_s"))
    val fit = slopes.groupBy(col("group_key"))
      .agg(
        count(lit(1)).as("n_pairs"),
        expr("percentile(_s, 0.5)").as("zipf_slope"),
        min(col("_s")).as("slope_min"),
        max(col("_s")).as("slope_max"))
    val heads = head.groupBy(col("group_key")).agg(count(lit(1)).as("n_head"))
    val out = v.join(heads, Seq("group_key")).join(fit, Seq("group_key"), "left")
      .select(col("group_key"), col("n_distinct_tokens"), col("n_head"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        col("zipf_slope"), col("slope_min"), col("slope_max"))
    graft.CacheLifecycle.releaseWhenExecuted(out, Seq(counts))
    out
  }
}
