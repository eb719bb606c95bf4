package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Bpe, BpeVocab}
import graft.operators.{Packing, Sampling, TextAnalysis}

/** Real-token queries: the q19/q61/q66/q97 family re-denominated in
  * REAL BPE tokens instead of the `bpeishTokenCount` regex
  * approximation. The original rows are kept — these are the `_bpe`
  * forms the r11 verdict asked for: token budgets, packing, and
  * chunking measured in the unit a model's context window and a
  * training run's token budget actually use.
  *
  * VOCABULARY: the family runs at the PRODUCTION-SCALE table —
  * [[BpeVocab.production]], 1956 merges trained on the combined
  * sf0.1 corpus and loaded through the standard `merges.txt`
  * interchange path ([[BpeVocab.fromMergesText]]), so every query
  * here exercises the loader + validation a real model vocabulary
  * arrives through. q188 deliberately stays on the embedded
  * 306-merge [[BpeVocab.default]] (it probes how a FIXED small
  * vocabulary behaves out-of-distribution); q198 is its
  * production-vocab counterpart.
  *
  * Oracle discipline: the ONE merge-table constant renders both the
  * engine's rank map and the DuckDB `merges` VALUES table; the
  * oracle replays the full BPE merge loop per DISTINCT word in a
  * recursive CTE ([[BpeVocab.docTokensCtes]]), so every count below
  * is exact-integer-checked end to end, not spot-checked. Replay
  * cost is distinct-word-bounded (|merges| multiplies the per-step
  * scan only): measured at sf0.01/1956 merges, 0.5 s on the
  * 31-word documents dictionary and 2.2 s on the 1507-word customer
  * name dictionary — the md5-word-slice TIER (q192) stays the
  * documented path for corpora whose dictionary outgrows that.
  */
object TokenQueries {

  /** Same [0,1) hash score as Sampling.hashScore, stated in DuckDB. */
  private def scoreSql(alias: String) =
    s"CAST(CAST(('0x' || substr(md5(CAST($alias.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE) / 4294967296.0"

  private def withBpeTokens(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("bpe_tokens",
        Bpe.bpeTokenCount(col("text"), BpeVocab.production).cast("long"))

  // ---------------------------------------------------------------
  // q181 — real-token stats per lang (the q19 surface, real tokens):
  // docs, BPE tokens, pre-tokens (words), and the fertility ratio
  // tokens/word — the number a tokenizer swap actually moves.
  // ---------------------------------------------------------------
  def q181BpeTokenStats(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("lang"),
        Bpe.bpeTokenCount(col("text"), BpeVocab.production)
          .cast("long").as("_bt"),
        size(regexp_extract_all(lower(col("text")),
          lit(BpeVocab.PretokenRegex), lit(0))).cast("long").as("_nw"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_bt")).as("total_bpe_tokens"),
        sum(col("_nw")).as("total_words"),
        when(sum(col("_nw")) > 0L,
          sum(col("_bt")).cast("double") / sum(col("_nw")).cast("double"))
          .as("tokens_per_word"))

  val q181Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)}
       |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(t.bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       |  CAST(SUM(t.n_words) AS BIGINT) AS total_words,
       |  CASE WHEN SUM(t.n_words) > 0 THEN
       |    CAST(SUM(t.bpe_tokens) AS DOUBLE) / CAST(SUM(t.n_words) AS DOUBLE)
       |  END AS tokens_per_word
       |FROM documents d JOIN dtok t ON d.doc_id = t.doc_id
       |GROUP BY d.lang""".stripMargin

  // ---------------------------------------------------------------
  // q182 — sequence packing by real tokens (the q61 surface): packs
  // sized in BPE tokens, the unit the packed context actually fills.
  // ---------------------------------------------------------------
  private val BpePackBudget = 1024L
  private val BpePackShards = 8

  def q182BpePacking(spark: SparkSession, d: String): DataFrame =
    Packing.packSummary(withBpeTokens(spark, d), "doc_id", "bpe_tokens",
      BpePackBudget, BpePackShards)

  val q182Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)},
       |scored AS (
       |  SELECT d.doc_id, t.bpe_tokens,
       |    CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 9, 4)) AS UBIGINT) AS BIGINT)
       |      % $BpePackShards AS shard,
       |    ${scoreSql("d")} AS s
       |  FROM documents d JOIN dtok t ON d.doc_id = t.doc_id),
       |packed AS (
       |  SELECT shard, doc_id, bpe_tokens,
       |    CAST(floor(CAST(sum(bpe_tokens) OVER (PARTITION BY shard ORDER BY s, doc_id
       |        ROWS UNBOUNDED PRECEDING) - bpe_tokens AS DOUBLE) / ${BpePackBudget}.0)
       |      AS BIGINT) AS pack_id
       |  FROM scored)
       |SELECT shard, pack_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(bpe_tokens) AS BIGINT) AS total_size,
       |  min(doc_id) AS min_id
       |FROM packed GROUP BY shard, pack_id""".stripMargin

  // ---------------------------------------------------------------
  // q183 — budget chunking in real tokens (the q66 surface): word-
  // boundary chunks of ≈48 BPE tokens via per-doc prefix sums, not
  // fixed word windows.
  // ---------------------------------------------------------------
  private val BpeChunkBudget = 48

  def q183BpeChunks(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.chunkByTokenBudget(Tables.documents(spark, d),
      "doc_id", "text", BpeChunkBudget, BpeVocab.production)

  val q183Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)},
       |wt AS (
       |  SELECT w.doc_id, w.pos, w.w, k.nt
       |  FROM words w JOIN wtok k USING (w)),
       |cum AS (
       |  SELECT doc_id, pos, w, nt,
       |    COALESCE(CAST(SUM(nt) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      CAST(0 AS BIGINT)) AS cb
       |  FROM wt)
       |SELECT doc_id, CAST(cb // $BpeChunkBudget AS BIGINT) AS chunk_idx,
       |  CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
       |  string_agg(w, ' ' ORDER BY pos) AS chunk_text
       |FROM cum GROUP BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------
  // q184 — corpus sampling to a real-token budget (the q97 surface):
  // keep a deterministic ~20k-BPE-token subset, not a char budget.
  // ---------------------------------------------------------------
  private val BpeTokenBudget = 20000L
  private val BpeBudgetBuckets = 4096

  def q184BpeBudgetSample(spark: SparkSession, d: String): DataFrame =
    Sampling.sampleToBudget(withBpeTokens(spark, d), "doc_id",
        col("bpe_tokens"), BpeTokenBudget, BpeBudgetBuckets)
      .select(col("doc_id"), col("bpe_tokens"))

  val q184Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)},
       |base AS (
       |  SELECT d.doc_id, t.bpe_tokens AS w, ${scoreSql("d")} AS s
       |  FROM documents d JOIN dtok t ON d.doc_id = t.doc_id),
       |b AS (SELECT *, CAST(floor(s * $BpeBudgetBuckets) AS BIGINT) AS bk FROM base),
       |pb AS (SELECT bk, CAST(sum(w) AS BIGINT) AS wb FROM b GROUP BY 1),
       |cumt AS (SELECT bk, wb,
       |    COALESCE(CAST(sum(wb) OVER (ORDER BY bk
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      CAST(0 AS BIGINT)) AS cumb
       |  FROM pb),
       |j AS (SELECT b.doc_id, b.w, b.s, b.bk, cumt.wb, cumt.cumb
       |  FROM b JOIN cumt ON b.bk = cumt.bk),
       |keep_full AS (
       |  SELECT doc_id, w FROM j WHERE cumb + wb <= $BpeTokenBudget),
       |boundary AS (
       |  SELECT doc_id, w, cumb,
       |    COALESCE(CAST(sum(w) OVER (PARTITION BY bk ORDER BY s, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      CAST(0 AS BIGINT)) AS run
       |  FROM j WHERE cumb < $BpeTokenBudget AND cumb + wb > $BpeTokenBudget),
       |keep_b AS (SELECT doc_id, w FROM boundary WHERE cumb + run < $BpeTokenBudget)
       |SELECT doc_id, w AS bpe_tokens FROM keep_full
       |UNION ALL SELECT doc_id, w AS bpe_tokens FROM keep_b""".stripMargin

  // ---------------------------------------------------------------
  // q185/q186 — n-gram LM perplexity quality gate (Stupid Backoff):
  // train a word-trigram model on the doc_id%10<8 slice, score the
  // rest. Per-doc scores (q185) and the per-source gate (q186). All
  // log₂ terms are exact Q16 integers via the shared fixed-point dag
  // (FixedPointLog) — the oracle replays lg() in a recursive CTE.
  // ---------------------------------------------------------------
  // −5.25 bits/token (exact in Q16): calibrated so the gate separates
  // the corpus's own quality tail (scored docs span ≈[−5.6, −3.9])
  private val LmThresholdQ16 = -344064L
  private val LmDiscount = graft.operators.LanguageModel.DiscountQ16
  private def lmTrainPred = col("doc_id") % 10 < 8

  def q185LmDocScores(spark: SparkSession, d: String): DataFrame =
    graft.operators.LanguageModel.lmQualityGate(
      Tables.documents(spark, d), "doc_id", "text", lmTrainPred,
      LmThresholdQ16)

  def q186LmSourceGate(spark: SparkSession, d: String): DataFrame = {
    val perDoc = q185LmDocScores(spark, d)
    perDoc.join(Tables.documents(spark, d).select("doc_id", "source"), "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("score_q16")).as("score_q16"),
        (sum(col("score_q16")).cast("double")
          / (lit(65536.0) * sum(col("n_tokens")).cast("double")))
          .as("avg_log2_prob"),
        sum(when(col("low_quality"), 1L).otherwise(0L)).as("n_low_quality"))
  }

  /** Shared oracle body: per-doc Stupid Backoff scores as `dsc`. */
  private def lmScoreCtes: String = {
    val gramSql = (src: String, win: String) =>
      s"""SELECT doc_id, pos, w,
         |    COALESCE(lag(w, 1) OVER $win, '<s>') AS w1,
         |    COALESCE(lag(w, 2) OVER $win, '<s>') AS w2
         |  FROM (SELECT doc_id, unnest(tk) AS w,
         |          unnest(generate_series(1, len(tk))) AS pos
         |        FROM (SELECT doc_id, regexp_extract_all(lower(text),
         |          '${BpeVocab.PretokenRegex}') AS tk FROM $src))
         |  WINDOW $win AS (PARTITION BY doc_id ORDER BY pos)""".stripMargin
    s"""train AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
       |scoredocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8),
       |tg AS (
       |  ${gramSql("train", "dwt")}),
       |c3 AS (SELECT w2, w1, w, CAST(count(*) AS BIGINT) AS n3 FROM tg GROUP BY 1, 2, 3),
       |cx3 AS (SELECT w2, w1, CAST(count(*) AS BIGINT) AS nc3 FROM tg GROUP BY 1, 2),
       |cb AS (SELECT w1, w, CAST(count(*) AS BIGINT) AS nb FROM tg GROUP BY 1, 2),
       |cx1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS nc1 FROM tg GROUP BY 1),
       |c1 AS (SELECT w, CAST(count(*) AS BIGINT) AS n1 FROM tg GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM tg),
       |nums(n) AS (
       |  SELECT DISTINCT n FROM (
       |    SELECT n3 AS n FROM c3 UNION ALL SELECT nc3 FROM cx3
       |    UNION ALL SELECT nb FROM cb UNION ALL SELECT nc1 FROM cx1
       |    UNION ALL SELECT n1 FROM c1 UNION ALL SELECT nn FROM tot)),
       |${graft.functions.FixedPointLog.log2fpSqlCtes},
       |tri AS (
       |  SELECT c3.w2, c3.w1, c3.w, la.lq - lb.lq AS lq3
       |  FROM c3 JOIN cx3 USING (w2, w1)
       |  JOIN lg la ON la.n = c3.n3 JOIN lg lb ON lb.n = cx3.nc3),
       |bi AS (
       |  SELECT cb.w1, cb.w, $LmDiscount + la.lq - lb.lq AS lqb
       |  FROM cb JOIN cx1 USING (w1)
       |  JOIN lg la ON la.n = cb.nb JOIN lg lb ON lb.n = cx1.nc1),
       |uni AS (
       |  SELECT c1.w, ${2 * LmDiscount} + la.lq - lt.lq AS lqu
       |  FROM c1 JOIN lg la ON la.n = c1.n1
       |  CROSS JOIN tot JOIN lg lt ON lt.n = tot.nn),
       |unk AS (
       |  SELECT ${2 * LmDiscount} - lt.lq AS uq
       |  FROM tot JOIN lg lt ON lt.n = tot.nn),
       |sgr AS (
       |  ${gramSql("scoredocs", "dws")}),
       |sc AS (
       |  SELECT sgr.doc_id, COALESCE(tri.lq3, bi.lqb, uni.lqu, unk.uq) AS q
       |  FROM sgr
       |  LEFT JOIN tri ON tri.w2 = sgr.w2 AND tri.w1 = sgr.w1 AND tri.w = sgr.w
       |  LEFT JOIN bi ON bi.w1 = sgr.w1 AND bi.w = sgr.w
       |  LEFT JOIN uni ON uni.w = sgr.w
       |  CROSS JOIN unk),
       |dsc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(q) AS BIGINT) AS score_q16
       |  FROM sc GROUP BY doc_id)""".stripMargin
  }

  val q185Sql: String =
    s"""WITH RECURSIVE $lmScoreCtes
       |SELECT doc_id, n_tokens, score_q16,
       |  CAST(score_q16 AS DOUBLE) / (65536.0 * CAST(n_tokens AS DOUBLE))
       |    AS avg_log2_prob,
       |  score_q16 < $LmThresholdQ16 * n_tokens AS low_quality
       |FROM dsc""".stripMargin

  val q186Sql: String =
    s"""WITH RECURSIVE $lmScoreCtes
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(s.n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(SUM(s.score_q16) AS BIGINT) AS score_q16,
       |  CAST(SUM(s.score_q16) AS DOUBLE)
       |    / (65536.0 * CAST(SUM(s.n_tokens) AS DOUBLE)) AS avg_log2_prob,
       |  CAST(SUM(CASE WHEN s.score_q16 < $LmThresholdQ16 * s.n_tokens
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality
       |FROM dsc s JOIN documents d USING (doc_id)
       |GROUP BY d.source""".stripMargin

  // ---------------------------------------------------------------
  // q187 — BPE vocabulary-utilization census: per-token occurrence
  // and document counts across the corpus. The tokenizer-eval view:
  // which vocab entries actually fire, and how token mass distributes
  // (a swapped-in vocab with dead entries or single-char fallbacks
  // shows up here before it shows up in training cost). Map-side
  // explode + one hash aggregate keyed by token; the output is
  // vocab-bounded, and the shuffle is bounded by distinct
  // (token, doc) pairs after map-side partial dedup — at true 100 TB
  // the monitoring form swaps count_distinct for
  // approx_count_distinct (or a sampled-documents census).
  // ---------------------------------------------------------------
  def q187BpeVocabCensus(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"),
        explode(Bpe.bpeTokens(col("text"), BpeVocab.production)).as("token"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"))

  val q187Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)},
       |wtl AS (
       |  SELECT w, string_split(trim(s), '  ') AS tl
       |  FROM steps
       |  WHERE NOT EXISTS (SELECT 1 FROM merges m WHERE instr(s, m.pair) > 0)),
       |tok AS (
       |  SELECT wo.doc_id, unnest(wtl.tl) AS token
       |  FROM words wo JOIN wtl ON wo.w = wtl.w)
       |SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       |FROM tok GROUP BY token""".stripMargin

  // ---------------------------------------------------------------
  // q190 — the LM score wired into the DECISION machinery (the way
  // q112's logit feeds q126/q127/q130): per-source threshold sweep of
  // q185's avg_log2_prob against the is_en label over the scored
  // split — per (source, threshold), the confusion counts and P/R/F1
  // of "keep if the LM score >= t". The sweep operator, band
  // conventions, and oracle shape are exactly the q127 family's;
  // only the score column (and its recursive-CTE provenance) differ.
  // Domain [-6, -3) x 12 bands: width 0.25 and every threshold edge
  // are exact binary doubles (the portability rule).
  // ---------------------------------------------------------------
  private val LmSweepLo = -6.0
  private val LmSweepHi = -3.0
  private val LmSweepBins = 12

  /** Fixture-backed bench rows (the EvalQueries.fixtureBacked
    * convention): q190 composes the decision sweep OVER the q185
    * scores, which keep their own timed rows — so its bench row times
    * the sweep, not a third LM training. */
  val fixtureBacked: Seq[String] = Seq("q190_lm_gate_sweep",
    "q199_neardup_token_accounting", "q200_neardup_mixture_plan",
    "q204_real_decode_census", "q207_real_audio_census",
    "q208_real_video_census", "q210_mixed_video_census",
    "q211_mixed_audio_census")

  def q190LmGateSweep(spark: SparkSession, d: String): DataFrame = {
    val perDoc = QueryFixtures.ensure(spark, d, "q190_lm_scores",
      "q190_lm_gate_sweep")(q185LmDocScores(spark, d))
    val labeled = perDoc.join(
      Tables.documents(spark, d).select(col("doc_id"), col("source"),
        (col("lang") === "en").as("_is_en")), "doc_id")
    graft.operators.Evaluation.thresholdSweepBy(
      labeled, col("source"), col("avg_log2_prob"), col("_is_en"),
      LmSweepLo, LmSweepHi, LmSweepBins)
      .withColumnRenamed("group_key", "source")
  }

  val q190Sql: String =
    s"""WITH RECURSIVE $lmScoreCtes,
       |lbl AS (
       |  SELECT s.doc_id,
       |    CAST(s.score_q16 AS DOUBLE) / (65536.0 * CAST(s.n_tokens AS DOUBLE)) AS v,
       |    d.source, d.lang = 'en' AS p0
       |  FROM dsc s JOIN documents d USING (doc_id)
       |  WHERE d.source IS NOT NULL AND d.lang IS NOT NULL),
       |b AS (
       |  SELECT source,
       |    LEAST(${LmSweepBins - 1}, GREATEST(0,
       |      CAST(FLOOR((v - ($LmSweepLo)) / 0.25) AS BIGINT))) AS band,
       |    CASE WHEN p0 THEN 1 ELSE 0 END AS p
       |  FROM lbl),
       |c AS (SELECT source, band, CAST(COUNT(*) AS BIGINT) AS n,
       |        CAST(SUM(p) AS BIGINT) AS n_pos
       |      FROM b GROUP BY source, band),
       |sp AS (SELECT g.source, spine.band,
       |    COALESCE(c.n, 0) AS n, COALESCE(c.n_pos, 0) AS n_pos
       |  FROM (SELECT DISTINCT source FROM b) g
       |  CROSS JOIN (SELECT UNNEST(range(0, $LmSweepBins)) AS band) spine
       |  LEFT JOIN c ON g.source = c.source AND spine.band = c.band),
       |w AS (SELECT source, band, n, n_pos,
       |    CAST(SUM(n_pos) OVER (PARTITION BY source ORDER BY band
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS tp,
       |    CAST(SUM(n) OVER (PARTITION BY source ORDER BY band
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS kept,
       |    CAST(SUM(n_pos) OVER (PARTITION BY source) AS BIGINT) AS p_all,
       |    CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS n_all
       |  FROM sp)
       |SELECT source, band, $LmSweepLo + band * 0.25 AS threshold,
       |  tp, kept - tp AS fp, p_all - tp AS fn,
       |  n_all - kept - (p_all - tp) AS tn,
       |  CASE WHEN kept > 0 THEN CAST(tp AS DOUBLE) / CAST(kept AS DOUBLE) END AS precision,
       |  CASE WHEN p_all > 0 THEN CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE) END AS recall,
       |  CASE WHEN kept > 0 AND p_all > 0
       |         AND (CAST(tp AS DOUBLE) / CAST(kept AS DOUBLE)
       |            + CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE)) > 0.0
       |    THEN 2.0 * (CAST(tp AS DOUBLE) / CAST(kept AS DOUBLE))
       |             * (CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE))
       |         / (CAST(tp AS DOUBLE) / CAST(kept AS DOUBLE)
       |          + CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE))
       |  END AS f1
       |FROM w""".stripMargin

  // ---------------------------------------------------------------
  // q188 — out-of-distribution fertility: the embedded vocabulary
  // applied to text it was NOT dominated by — customer names (the
  // 'customer#NNNNNNNNN segment' surface), whose digit runs tokenize
  // through rank chains several merges deep and whose fertility sits
  // well above the in-distribution 1.0 the documents table shows.
  // This is the table a tokenizer swap is judged on: how does the
  // FIXED vocabulary behave on incoming data shaped unlike its
  // training corpus. Same map-side codegen expression; the oracle
  // replays the full merge loop over the distinct NAME words.
  // ---------------------------------------------------------------
  def q188BpeNameFertility(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .select(col("c_mktsegment").as("segment"),
        Bpe.bpeTokenCount(
          concat_ws(" ", col("c_name"), col("c_mktsegment")))
          .cast("long").as("_bt"),
        size(regexp_extract_all(
          lower(concat_ws(" ", col("c_name"), col("c_mktsegment"))),
          lit(BpeVocab.PretokenRegex), lit(0))).cast("long").as("_nw"))
      .groupBy(col("segment"))
      .agg(
        count(lit(1)).as("n_names"),
        sum(col("_bt")).as("total_bpe_tokens"),
        sum(col("_nw")).as("total_words"),
        when(sum(col("_nw")) > 0L,
          sum(col("_bt")).cast("double") / sum(col("_nw")).cast("double"))
          .as("tokens_per_word"))

  val q188Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(table =
         "(SELECT c_custkey AS doc_id, " +
           "c_name || ' ' || c_mktsegment AS text FROM customer)")}
       |SELECT c.c_mktsegment AS segment,
       |  CAST(COUNT(*) AS BIGINT) AS n_names,
       |  CAST(SUM(t.bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       |  CAST(SUM(t.n_words) AS BIGINT) AS total_words,
       |  CASE WHEN SUM(t.n_words) > 0 THEN
       |    CAST(SUM(t.bpe_tokens) AS DOUBLE) / CAST(SUM(t.n_words) AS DOUBLE)
       |  END AS tokens_per_word
       |FROM customer c JOIN dtok t ON c.c_custkey = t.doc_id
       |GROUP BY c.c_mktsegment""".stripMargin

  // ---------------------------------------------------------------
  // q192 — the TIERED ORACLE demonstrated as a live query: per-word
  // occurrence and token counts over a DETERMINISTIC md5-sampled
  // word slice (md5-prefix mod 4 == 0, ~25% of distinct words). The
  // oracle replays the merge loop ONLY for sampled words, so the
  // replay cost scales with the slice — the strategy that keeps a
  // 512–50k-merge production vocabulary's oracle tractable (full
  // hash-exactness on the sampled surface; corpus totals stay on the
  // q181 full-replay row, affordable because replay is
  // distinct-word-bounded). Engine side: the slice predicate is the
  // same portable md5-prefix integer both engines already share.
  // ---------------------------------------------------------------
  def q192BpeWordSlice(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(explode(regexp_extract_all(lower(col("text")),
        lit(BpeVocab.PretokenRegex), lit(0))).as("word"))
      .filter(graft.functions.Md5Expressions.md5PrefixLong(
        col("word"), 8, 4) === 0L)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_occurrences"))
      .withColumn("bpe_tokens",
        Bpe.bpeTokenCount(col("word"), BpeVocab.production).cast("long"))

  val q192Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production,
         wordPredicate =
           "CAST(('0x' || substr(md5(w), 1, 8)) AS UBIGINT) % 4 = 0")},
       |sw AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_occurrences
       |  FROM words
       |  WHERE CAST(('0x' || substr(md5(w), 1, 8)) AS UBIGINT) % 4 = 0
       |  GROUP BY w)
       |SELECT sw.w AS word, sw.n_occurrences, k.nt AS bpe_tokens
       |FROM sw JOIN wtok k USING (w)""".stripMargin

  // ---------------------------------------------------------------
  // q198 — PRODUCTION-vocab out-of-distribution fertility: q188's
  // customer-name surface under the 1956-merge production table. The
  // non-degenerate production check: documents words all merge to
  // single tokens (in-distribution fertility 1.0), but the sf0.01
  // name digit runs only PARTIALLY overlap the sf0.1-trained digit
  // merges, so fertility lands strictly between 1 and the char count
  // — the surface where a wrong merge-loop step would actually move
  // a number. Oracle: full replay over the 1507-word name dictionary
  // (measured 2.2 s — the affordable tier; see the header note).
  // ---------------------------------------------------------------
  def q198ProdNameFertility(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .select(col("c_mktsegment").as("segment"),
        Bpe.bpeTokenCount(
          concat_ws(" ", col("c_name"), col("c_mktsegment")),
          BpeVocab.production)
          .cast("long").as("_bt"),
        size(regexp_extract_all(
          lower(concat_ws(" ", col("c_name"), col("c_mktsegment"))),
          lit(BpeVocab.PretokenRegex), lit(0))).cast("long").as("_nw"))
      .groupBy(col("segment"))
      .agg(
        count(lit(1)).as("n_names"),
        sum(col("_bt")).as("total_bpe_tokens"),
        sum(col("_nw")).as("total_words"),
        when(sum(col("_nw")) > 0L,
          sum(col("_bt")).cast("double") / sum(col("_nw")).cast("double"))
          .as("tokens_per_word"))

  val q198Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production, table =
         "(SELECT c_custkey AS doc_id, " +
           "c_name || ' ' || c_mktsegment AS text FROM customer)")}
       |SELECT c.c_mktsegment AS segment,
       |  CAST(COUNT(*) AS BIGINT) AS n_names,
       |  CAST(SUM(t.bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       |  CAST(SUM(t.n_words) AS BIGINT) AS total_words,
       |  CASE WHEN SUM(t.n_words) > 0 THEN
       |    CAST(SUM(t.bpe_tokens) AS DOUBLE) / CAST(SUM(t.n_words) AS DOUBLE)
       |  END AS tokens_per_word
       |FROM customer c JOIN dtok t ON c.c_custkey = t.doc_id
       |GROUP BY c.c_mktsegment""".stripMargin

  // ---------------------------------------------------------------
  // q193 — temperature-sampled mixture plan in REAL tokens: per
  // source, raw token share → τ=2 temperature weight (sqrt — the one
  // temperature the no-transcendental rule admits exactly) → the
  // token budget apportioned and expressed as per-source epochs. The
  // table a mixture-provisioning run reads before q71/q109 execute
  // the row-level mixing/ordering.
  // ---------------------------------------------------------------
  private val MixtureBudgetTokens = 50000L

  /** The quantize → normalize → apportion oracle tail shared by every
    * mixture-plan SQL (q193/q197/q200/q201): expects a CTE
    * `st(source, n_docs, tk)` in scope. ONE renderer, so an
    * arithmetic fix (e.g. the r14 HUGEINT accumulation) can never
    * miss a copy — the mirror of the engine-side shared
    * `mixturePlanFromTotals` core. */
  private lazy val mixturePlanTailSql: String =
    s"""q AS (
       |  SELECT *, CAST(FLOOR(SQRT(CAST(tk AS DOUBLE)) * 1000000000.0)
       |    AS BIGINT) AS qi
       |  FROM st),
       |tot AS (
       |  SELECT CAST(SUM(tk) AS HUGEINT) AS ttk, CAST(SUM(qi) AS HUGEINT) AS sq
       |  FROM q)
       |SELECT q.source, q.n_docs, q.tk AS total_tokens,
       |  CAST(q.tk AS DOUBLE) / CAST(tot.ttk AS DOUBLE) AS token_share,
       |  CAST(q.qi AS DOUBLE) / CAST(tot.sq AS DOUBLE) AS temp_weight,
       |  ${MixtureBudgetTokens}.0
       |    * (CAST(q.qi AS DOUBLE) / CAST(tot.sq AS DOUBLE)) AS target_tokens,
       |  (${MixtureBudgetTokens}.0
       |    * (CAST(q.qi AS DOUBLE) / CAST(tot.sq AS DOUBLE)))
       |    / CAST(q.tk AS DOUBLE) AS epochs
       |FROM q CROSS JOIN tot""".stripMargin

  def q193TokenMixturePlan(spark: SparkSession, d: String): DataFrame =
    Sampling.temperatureMixturePlan(
      withBpeTokens(spark, d), col("source"), col("bpe_tokens"),
      MixtureBudgetTokens)
      .withColumnRenamed("group_key", "source")

  val q193Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)},
       |st AS (
       |  SELECT d.source AS source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(t.bpe_tokens) AS BIGINT) AS tk
       |  FROM documents d JOIN dtok t USING (doc_id)
       |  WHERE d.source IS NOT NULL
       |  GROUP BY d.source),
       |$mixturePlanTailSql""".stripMargin

  // ---------------------------------------------------------------
  // q194 — per-source token-diversity census with EXACT fixed-point
  // Shannon entropy: H = lg N − (Σ c·lg c)/N, every lg the Q16
  // integer dag (FixedPointLog), Σ c·lg c an order-free DECIMAL sum —
  // entropy on the hashed surface without a transcendental. The
  // corpus-composition signal: templated/spammy sources read low
  // here before any human look.
  // ---------------------------------------------------------------
  def q194SourceEntropy(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenEntropyBy(
      Tables.documents(spark, d), col("source"), col("text"),
      BpeVocab.production)
      .withColumnRenamed("group_key", "source")

  val q194Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)},
       |wtl AS (
       |  SELECT w, string_split(trim(s), '  ') AS tl
       |  FROM steps
       |  WHERE NOT EXISTS (SELECT 1 FROM merges m WHERE instr(s, m.pair) > 0)),
       |tok AS (
       |  SELECT d.source, unnest(wtl.tl) AS token
       |  FROM words wo
       |  JOIN wtl ON wo.w = wtl.w
       |  JOIN documents d ON wo.doc_id = d.doc_id
       |  WHERE d.source IS NOT NULL AND d.text IS NOT NULL),
       |cnt AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
       |        FROM tok GROUP BY source, token),
       |per AS (SELECT source, CAST(SUM(c) AS BIGINT) AS nt,
       |          CAST(COUNT(*) AS BIGINT) AS v
       |        FROM cnt GROUP BY source),
       |nums(n) AS (SELECT DISTINCT n FROM (
       |  SELECT c AS n FROM cnt
       |  UNION ALL SELECT nt FROM per
       |  UNION ALL SELECT v FROM per)),
       |${graft.functions.FixedPointLog.log2fpSqlCtes},
       |sm AS (
       |  SELECT cnt.source,
       |    CAST(SUM(CAST(cnt.c AS HUGEINT) * lg.lq) AS HUGEINT) AS s
       |  FROM cnt JOIN lg ON lg.n = cnt.c GROUP BY cnt.source),
       |f AS (
       |  SELECT per.source, per.nt, per.v,
       |    CAST(per.v AS DOUBLE) / CAST(per.nt AS DOUBLE) AS ttr,
       |    CAST(ln.lq AS DOUBLE) / 65536.0
       |      - CAST(sm.s AS DOUBLE) / (65536.0 * CAST(per.nt AS DOUBLE)) AS h,
       |    lv.lq AS lqv
       |  FROM per JOIN sm USING (source)
       |  JOIN lg ln ON ln.n = per.nt
       |  JOIN lg lv ON lv.n = per.v)
       |SELECT source, nt AS n_tokens, v AS distinct_tokens,
       |  ttr AS type_token_ratio, h AS entropy_bits,
       |  CASE WHEN v > 1 THEN h / (CAST(lqv AS DOUBLE) / 65536.0)
       |  END AS normalized_entropy
       |FROM f""".stripMargin

  // ---------------------------------------------------------------
  // q195 — per-source Zipf rank–frequency slope: the SHAPE companion
  // to q194's entropy level. Theil–Sen over (lg rank, lg count) on
  // the top-256 head, both axes the exact Q16 log dag — natural text
  // reads near −1; templated/generated sources bend away. The pair
  // census is k²-bounded per source however large the vocabulary.
  // ---------------------------------------------------------------
  private val ZipfHeadK = 256

  def q195ZipfSlope(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.zipfSlopeBy(
      Tables.documents(spark, d), col("source"), col("text"), ZipfHeadK,
      BpeVocab.production)
      .withColumnRenamed("group_key", "source")

  val q195Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)},
       |wtl AS (
       |  SELECT w, string_split(trim(s), '  ') AS tl
       |  FROM steps
       |  WHERE NOT EXISTS (SELECT 1 FROM merges m WHERE instr(s, m.pair) > 0)),
       |tok AS (
       |  SELECT d.source, unnest(wtl.tl) AS token
       |  FROM words wo
       |  JOIN wtl ON wo.w = wtl.w
       |  JOIN documents d ON wo.doc_id = d.doc_id
       |  WHERE d.source IS NOT NULL AND d.text IS NOT NULL),
       |cnt AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
       |        FROM tok GROUP BY source, token),
       |v AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ndt
       |      FROM cnt GROUP BY source),
       |rk AS (SELECT source, c,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY c DESC, token ASC) AS BIGINT) AS r
       |  FROM cnt),
       |hd AS (SELECT * FROM rk WHERE r <= $ZipfHeadK),
       |nums(n) AS (SELECT DISTINCT n FROM (
       |  SELECT c AS n FROM hd UNION ALL SELECT r FROM hd)),
       |${graft.functions.FixedPointLog.log2fpSqlCtes},
       |hx AS (
       |  SELECT hd.source, hd.r, lr.lq AS lgr, lc.lq AS lgc
       |  FROM hd JOIN lg lr ON lr.n = hd.r JOIN lg lc ON lc.n = hd.c),
       |sl AS (
       |  SELECT a.source,
       |    CAST(b.lgc - a.lgc AS DOUBLE) / CAST(b.lgr - a.lgr AS DOUBLE) AS s
       |  FROM hx a JOIN hx b ON a.source = b.source AND a.r < b.r
       |  WHERE b.lgr <> a.lgr),
       |fit AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    quantile_cont(s, 0.5) AS zipf_slope,
       |    MIN(s) AS slope_min, MAX(s) AS slope_max
       |  FROM sl GROUP BY source),
       |hh AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_head
       |       FROM hd GROUP BY source)
       |SELECT v.source, v.ndt AS n_distinct_tokens, hh.n_head,
       |  CAST(COALESCE(fit.n_pairs, 0) AS BIGINT) AS n_pairs,
       |  fit.zipf_slope, fit.slope_min, fit.slope_max
       |FROM v JOIN hh USING (source) LEFT JOIN fit USING (source)""".stripMargin

  // ---------------------------------------------------------------
  // q196 — dedup-adjusted token accounting: per source, the raw vs
  // UNIQUE-CONTENT token totals under the corpus-wide exact dedup
  // (q10's min-id representative election) — the number that corrects
  // every budget/mixture computation for duplicated mass. A source
  // whose dup_token_frac is high contributes far fewer effective
  // tokens than its raw count claims; q193's plan should be read
  // against kept_tokens, and this is the table that says by how much.
  // ---------------------------------------------------------------
  def q196DedupTokenAccounting(spark: SparkSession, d: String): DataFrame = {
    val docs = withBpeTokens(spark, d)
      .select(col("source"), col("doc_id"), col("bpe_tokens"))
    val kept = graft.operators.Dedup.dropExactDuplicates(
        Tables.documents(spark, d), "doc_id", col("text"))
      .select(col("doc_id"), lit(1L).as("_k"))
    val tot = sum(col("bpe_tokens"))
    val keptTok = sum(when(col("_k").isNotNull, col("bpe_tokens")).otherwise(0L))
    docs.join(kept, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("_k"), lit(0L))).as("n_kept_docs"),
        tot.as("total_tokens"),
        keptTok.as("kept_tokens"),
        when(tot > 0L,
          (tot - keptTok).cast("double") / tot.cast("double"))
          .as("dup_token_frac"))
  }

  val q196Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)},
       |kp AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN kp.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept_docs,
       |  CAST(SUM(t.bpe_tokens) AS BIGINT) AS total_tokens,
       |  CAST(SUM(CASE WHEN kp.doc_id IS NOT NULL THEN t.bpe_tokens ELSE 0 END)
       |    AS BIGINT) AS kept_tokens,
       |  CASE WHEN SUM(t.bpe_tokens) > 0 THEN
       |    CAST(SUM(t.bpe_tokens)
       |        - SUM(CASE WHEN kp.doc_id IS NOT NULL THEN t.bpe_tokens ELSE 0 END)
       |      AS DOUBLE) / CAST(SUM(t.bpe_tokens) AS DOUBLE)
       |  END AS dup_token_frac
       |FROM documents d
       |JOIN dtok t USING (doc_id)
       |LEFT JOIN kp ON d.doc_id = kp.doc_id
       |GROUP BY d.source""".stripMargin

  // ---------------------------------------------------------------
  // q197 — the mixture plan provisioned on UNIQUE-CONTENT tokens:
  // q193's temperature apportionment computed over the exact-deduped
  // corpus (q196's representative election), so a source padded with
  // duplicates cannot buy mixture weight with repeated mass — the
  // composition a real provisioning run executes.
  // ---------------------------------------------------------------
  def q197DedupMixturePlan(spark: SparkSession, d: String): DataFrame = {
    val kept = graft.operators.Dedup.dropExactDuplicates(
      Tables.documents(spark, d), "doc_id", col("text")).select("doc_id")
    Sampling.temperatureMixturePlan(
      withBpeTokens(spark, d).join(kept, Seq("doc_id"), "left_semi"),
      col("source"), col("bpe_tokens"), MixtureBudgetTokens)
      .withColumnRenamed("group_key", "source")
  }

  val q197Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)},
       |kp AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |st AS (
       |  SELECT d.source AS source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(t.bpe_tokens) AS BIGINT) AS tk
       |  FROM documents d
       |  JOIN kp ON d.doc_id = kp.doc_id
       |  JOIN dtok t ON d.doc_id = t.doc_id
       |  WHERE d.source IS NOT NULL
       |  GROUP BY d.source),
       |$mixturePlanTailSql""".stripMargin

  // ---------------------------------------------------------------
  // q199 — NEAR-dup-adjusted token accounting: q196 with the unique-
  // content election replaced by the q128 cluster keep-list, so the
  // discount covers near-duplicate mass (boilerplate variants, light
  // edits) that exact hashing cannot see — the number a real
  // provisioning run wants. A doc is discounted iff the keep-list
  // DROPS it (keep=false); unclustered docs are implicitly kept.
  // The keep-list is a materialized fixture (in production it IS a
  // standing table — q128/q129 maintain it), so the bench times the
  // accounting join, not a re-clustering.
  // ---------------------------------------------------------------
  private def nearDupDropList(
      spark: SparkSession, d: String, owner: String): DataFrame =
    QueryFixtures.ensure(spark, d, "q199_keep_list", owner)(
      ExtensionQueries.q128ClusterKeepList(spark, d))
      .filter(!col("keep")).select(col("doc_id"))

  def q199NearDupTokenAccounting(spark: SparkSession, d: String): DataFrame = {
    val docs = withBpeTokens(spark, d)
      .select(col("source"), col("doc_id"), col("bpe_tokens"))
    val dropped = nearDupDropList(spark, d, "q199_neardup_token_accounting")
      .withColumn("_d", lit(1L))
    val tot = sum(col("bpe_tokens"))
    val keptTok = sum(when(col("_d").isNull, col("bpe_tokens")).otherwise(0L))
    docs.join(dropped, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("_d").isNull, 1L).otherwise(0L)).as("n_kept_docs"),
        tot.as("total_tokens"),
        keptTok.as("kept_tokens"),
        when(tot > 0L,
          (tot - keptTok).cast("double") / tot.cast("double"))
          .as("dup_token_frac"))
  }

  lazy val q199Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)},
       |kl AS (${ExtensionQueries.q128Sql}),
       |dr AS (SELECT doc_id FROM kl WHERE NOT keep)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept_docs,
       |  CAST(SUM(t.bpe_tokens) AS BIGINT) AS total_tokens,
       |  CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN t.bpe_tokens ELSE 0 END)
       |    AS BIGINT) AS kept_tokens,
       |  CASE WHEN SUM(t.bpe_tokens) > 0 THEN
       |    CAST(SUM(t.bpe_tokens)
       |        - SUM(CASE WHEN dr.doc_id IS NULL THEN t.bpe_tokens ELSE 0 END)
       |      AS DOUBLE) / CAST(SUM(t.bpe_tokens) AS DOUBLE)
       |  END AS dup_token_frac
       |FROM documents d
       |JOIN dtok t USING (doc_id)
       |LEFT JOIN dr ON d.doc_id = dr.doc_id
       |GROUP BY d.source""".stripMargin

  // ---------------------------------------------------------------
  // q200 — the mixture plan provisioned on NEAR-dup-unique tokens:
  // q197's composition with the q128 keep-list as the election, so a
  // source padded with light paraphrase/boilerplate variants cannot
  // buy mixture weight any more than one padded with byte-identical
  // copies. Same shared quantize → normalize → apportion core —
  // the three plans (raw q193, exact-deduped q197, near-deduped
  // q200) differ ONLY in which docs survive into the totals.
  // ---------------------------------------------------------------
  def q200NearDupMixturePlan(spark: SparkSession, d: String): DataFrame = {
    val dropped = nearDupDropList(spark, d, "q200_neardup_mixture_plan")
    Sampling.temperatureMixturePlan(
      withBpeTokens(spark, d).join(dropped, Seq("doc_id"), "left_anti"),
      col("source"), col("bpe_tokens"), MixtureBudgetTokens)
      .withColumnRenamed("group_key", "source")
  }

  lazy val q200Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)},
       |kl AS (${ExtensionQueries.q128Sql}),
       |dr AS (SELECT doc_id FROM kl WHERE NOT keep),
       |st AS (
       |  SELECT d.source AS source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(t.bpe_tokens) AS BIGINT) AS tk
       |  FROM documents d
       |  JOIN dtok t ON d.doc_id = t.doc_id
       |  LEFT JOIN dr ON d.doc_id = dr.doc_id
       |  WHERE d.source IS NOT NULL AND dr.doc_id IS NULL
       |  GROUP BY d.source),
       |$mixturePlanTailSql""".stripMargin

  // ---------------------------------------------------------------
  // q201 — the MULTIMODAL mixture plan: the token economy spanning
  // text AND image sources in one provisioning table. Text rows cost
  // production-vocab BPE tokens; image rows (the q21 media rotation,
  // doc_id % 3 == 0) cost ViT patch tokens — ceil(w/16)·ceil(h/16)+1
  // (Multimodal.patchTokens) over the corpus's synthetic stand-in
  // dimensions, derived from the SAME portable md5-prefix integer
  // both engines share (the decode path's hash-derived stub dims,
  // restated portably; a real deployment feeds decodeFeatures'
  // header-probed width/height through the identical expression).
  // Image sources enter the plan as 'img:<source>' group keys, so
  // temperature apportionment trades text against image mass in one
  // budget — the table a multimodal training run is provisioned from.
  // ---------------------------------------------------------------
  private val PatchSize = 16

  /** The ViT patch-token arithmetic as DuckDB text — ONE renderer for
    * q201/q203 so the ceil dag cannot drift between copies. `w`/`h`
    * are SQL expressions for the dimension values. */
  private def patchTokensSql(w: String, h: String): String =
    s"((($w) + ${PatchSize - 1}) // $PatchSize)" +
      s" * ((($h) + ${PatchSize - 1}) // $PatchSize) + 1"

  /** The decode stub's hash-derived stand-in dimensions/duration
    * restated on the portable md5-prefix integer (shared by
    * q201/q203; the oracle states the same arithmetic over
    * `CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT)`). */
  private def mediaStandIns: (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val p = graft.functions.Md5Expressions.md5PrefixLong(col("text"), 8)
    (lit(64L) + pmod(p, lit(1024L)),
      lit(64L) + pmod(shiftright(p, 10), lit(1024L)),
      lit(1000L) + pmod(p, lit(60000L)))
  }

  def q201MultimodalMixturePlan(spark: SparkSession, d: String): DataFrame = {
    val text = withBpeTokens(spark, d)
      .select(col("source"), col("bpe_tokens").cast("long").as("tokens"))
    val (w, h, _) = mediaStandIns
    val img = Tables.documents(spark, d)
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(concat(lit("img:"), col("source")).as("source"),
        graft.operators.Multimodal.patchTokens(w, h, PatchSize).as("tokens"))
    Sampling.temperatureMixturePlan(
      text.unionByName(img), col("source"), col("tokens"),
      MixtureBudgetTokens)
      .withColumnRenamed("group_key", "source")
  }

  val q201Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)},
       |tx AS (
       |  SELECT d.source AS source, CAST(t.bpe_tokens AS BIGINT) AS tokens
       |  FROM documents d JOIN dtok t USING (doc_id)
       |  WHERE d.source IS NOT NULL),
       |imp AS (
       |  SELECT 'img:' || d.source AS source,
       |    CAST(('0x' || substr(md5(d.text), 1, 8)) AS UBIGINT) AS p
       |  FROM documents d
       |  WHERE d.doc_id % 3 = 0 AND d.source IS NOT NULL
       |    AND d.text IS NOT NULL),
       |im AS (
       |  SELECT source,
       |    CAST(${patchTokensSql("64 + p % 1024", "64 + (p // 1024) % 1024")}
       |      AS BIGINT) AS tokens
       |  FROM imp),
       |u AS (SELECT * FROM tx UNION ALL SELECT * FROM im),
       |st AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(tokens) AS BIGINT) AS tk
       |  FROM u GROUP BY source),
       |$mixturePlanTailSql""".stripMargin

  // ---------------------------------------------------------------
  // q202 — tokenizer compression ratio: UTF-8 bytes per BPE token,
  // per source, at the production vocabulary — THE standard metric a
  // tokenizer swap is judged on (a better-fit vocabulary compresses
  // more bytes into each token; a mismatched one fragments). Rides
  // TextAnalysis.tokenizerCompressionBy — per-doc integer partials
  // folded through the SAME compressionFromCensus dag the maintained
  // form uses, so batch and streamed can never drift. NULL-source and
  // NULL-text rows are excluded (the census exclusion).
  // ---------------------------------------------------------------
  def q202TokenizerCompression(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenizerCompressionBy(
      Tables.documents(spark, d), col("source"), col("text"),
      BpeVocab.production)
      .withColumnRenamed("group_key", "source")

  val q202Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.production)}
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(octet_length(encode(d.text))) AS BIGINT) AS total_bytes,
       |  CAST(SUM(t.bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       |  CASE WHEN SUM(t.bpe_tokens) > 0 THEN
       |    CAST(SUM(octet_length(encode(d.text))) AS DOUBLE)
       |      / CAST(SUM(t.bpe_tokens) AS DOUBLE)
       |  END AS bytes_per_token
       |FROM documents d JOIN dtok t USING (doc_id)
       |WHERE d.source IS NOT NULL AND d.text IS NOT NULL
       |GROUP BY d.source""".stripMargin

  // ---------------------------------------------------------------
  // q203 — the FULL media token census: per (kind, source), item and
  // token totals under each modality's costing rule — image rows cost
  // ViT patches, audio rows cost duration×rate speech-encoder tokens,
  // video rows cost sampled-frames×patches (Multimodal.audioTokens /
  // videoTokens / patchTokens). Dimensions and duration are the
  // decode stub's hash-derived stand-ins restated on the portable
  // md5-prefix integer (q201's convention); a real deployment feeds
  // decodeFeatures' probed values through the identical expressions.
  // The per-modality provisioning table q201's cross-modal plan reads
  // its image row from, completed for audio/video.
  // ---------------------------------------------------------------
  private val AudioTokensPerSecond = 50
  private val VideoFrames = 8

  def q203MediaTokenCensus(spark: SparkSession, d: String): DataFrame = {
    val M = graft.operators.Multimodal
    val (w, h, dur) = mediaStandIns
    val kind = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    val tokens = when(kind === "image", M.patchTokens(w, h, PatchSize))
      .when(kind === "audio", M.audioTokens(dur, AudioTokensPerSecond))
      .otherwise(M.videoTokens(w, h, VideoFrames, PatchSize))
    Tables.documents(spark, d)
      .filter(col("source").isNotNull && col("text").isNotNull)
      .select(kind.as("kind"), col("source"), tokens.as("_tk"))
      .groupBy(col("kind"), col("source"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("_tk")).as("total_tokens"))
  }

  val q203Sql: String =
    s"""WITH b AS (
       |  SELECT CASE CAST(doc_id % 3 AS INT)
       |      WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |    source,
       |    CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) AS p
       |  FROM documents
       |  WHERE source IS NOT NULL AND text IS NOT NULL),
       |t AS (
       |  SELECT kind, source,
       |    CASE kind
       |      WHEN 'image' THEN
       |        ${patchTokensSql("64 + p % 1024", "64 + (p // 1024) % 1024")}
       |      WHEN 'audio' THEN
       |        ((1000 + p % 60000) * $AudioTokensPerSecond + 999) // 1000
       |      ELSE
       |        $VideoFrames * (${patchTokensSql(
                  "64 + p % 1024", "64 + (p // 1024) % 1024")})
       |    END AS tk
       |  FROM b)
       |SELECT kind, source, CAST(COUNT(*) AS BIGINT) AS n_items,
       |  CAST(SUM(tk) AS BIGINT) AS total_tokens
       |FROM t GROUP BY kind, source""".stripMargin

  // ---------------------------------------------------------------
  // q204 — REAL-decode media census (the image leg priced from real
  // decoded dimensions): the fixture synthesizes an actual PNG per
  // image-rotation doc at dimensions derived from the portable
  // md5-prefix integer, then runs the REAL decodeFeatures path —
  // javax.imageio header probe, batched mapPartitions — over those
  // payloads and persists what the PROBE returned. The census prices
  // ViT patch tokens from the probed width/height; the oracle
  // restates the GENERATOR arithmetic (dims from md5). A hash match
  // therefore proves the real decode round-trips: if the ImageIO
  // probe misread any header — or silently fell back to the stub
  // (format would read 'synthetic', dims would be hash-derived) —
  // n_png and every token total would diverge. This replaces q201/
  // q203's stand-in-dimension convention with decodeFeatures' probed
  // values on the image leg, oracle-checked.
  // ---------------------------------------------------------------
  private def q204MediaDimsFixture(
      spark: SparkSession, d: String, owner: String): DataFrame =
    QueryFixtures.ensure(spark, d, "q204_media_dims", owner) {
      import spark.implicits._
      val M = graft.operators.Multimodal
      val p = graft.functions.Md5Expressions.md5PrefixLong(col("text"), 8)
      val media = Tables.documents(spark, d)
        .filter(pmod(col("doc_id"), lit(3)) === 0 &&
          col("source").isNotNull && col("text").isNotNull)
        .select(col("doc_id").as("_1"), col("source").as("_2"),
          (lit(16L) + pmod(p, lit(256L))).cast("int").as("_3"),
          (lit(16L) + pmod(shiftright(p, 8), lit(256L))).cast("int").as("_4"))
        .as[(Long, String, Int, Int)]
        .map { case (id, src, w, h) =>
          // fully-qualified object calls: a local alias val would be
          // captured into the closure and the module object is not
          // Serializable
          graft.operators.Multimodal.MediaItem(id, "image",
            graft.operators.Multimodal.synthesizePng(w, h), src) }
        .toDF()
      M.decodeFeatures(spark, media, partitions = 32)
        .select(col("media_id"), col("width"), col("height"), col("format"))
    }

  def q204RealDecodeCensus(spark: SparkSession, d: String): DataFrame = {
    val M = graft.operators.Multimodal
    val dims = q204MediaDimsFixture(spark, d, "q204_real_decode_census")
    dims.join(
        Tables.documents(spark, d)
          .select(col("doc_id").as("media_id"), col("source")),
        Seq("media_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_images"),
        sum(when(col("format") === "png", 1L).otherwise(0L)).as("n_png"),
        sum(M.patchTokens(col("width"), col("height"), PatchSize))
          .as("total_patch_tokens"))
  }

  val q204Sql: String =
    s"""WITH imp AS (
       |  SELECT source, CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) AS p
       |  FROM documents
       |  WHERE doc_id % 3 = 0 AND source IS NOT NULL AND text IS NOT NULL)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_images,
       |  CAST(COUNT(*) AS BIGINT) AS n_png,
       |  CAST(SUM(${patchTokensSql("16 + p % 256", "16 + (p // 256) % 256")})
       |    AS BIGINT) AS total_patch_tokens
       |FROM imp GROUP BY source""".stripMargin

  // ---------------------------------------------------------------
  // q205 — the LARGE (15,971-merge) vocabulary demonstrated under
  // the q192 tiered-oracle convention, on a genuinely OUT-OF-
  // VOCABULARY surface: order keys as digit strings. The training
  // corpus (name/props text) never saw bare order keys, so each
  // sampled number tokenizes through PARTIAL digit-run merges —
  // fertility lands strictly between 1 and the digit count, the
  // regime where a wrong merge-loop step at production |merges|
  // would actually move a result. The md5 slice (mod 256, ~55 words
  // at sf0.01) keeps the oracle's 15,971-row VALUES replay at ~2 s;
  // the engine encode is |merges|-insensitive (per-thread word memo).
  // ---------------------------------------------------------------
  def q205LargeVocabFertility(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select(col("o_orderkey").cast("string").as("word"))
      .filter(graft.functions.Md5Expressions.md5PrefixLong(
        col("word"), 8, 256) === 0L)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_occurrences"))
      .withColumn("bpe_tokens",
        Bpe.bpeTokenCount(col("word"), BpeVocab.large).cast("long"))
      .withColumn("n_chars", length(col("word")).cast("long"))

  val q205Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.large,
         table = "(SELECT o_orderkey AS doc_id, " +
           "CAST(o_orderkey AS VARCHAR) AS text FROM orders)",
         wordPredicate =
           "CAST(('0x' || substr(md5(w), 1, 8)) AS UBIGINT) % 256 = 0")},
       |sw AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_occurrences
       |  FROM words
       |  WHERE CAST(('0x' || substr(md5(w), 1, 8)) AS UBIGINT) % 256 = 0
       |  GROUP BY w)
       |SELECT sw.w AS word, sw.n_occurrences, k.nt AS bpe_tokens,
       |  CAST(len(sw.w) AS BIGINT) AS n_chars
       |FROM sw JOIN wtok k USING (w)""".stripMargin

  // ---------------------------------------------------------------
  // q206 — tokenizer compression ratio at the LARGE vocabulary: the
  // q202 dag re-denominated in BpeVocab.large — the bytes-per-token
  // comparison row a tokenizer swap is judged on (1956-merge
  // production vs 15,971-merge large over the same corpus). The
  // oracle's full replay stays cheap because documents carry only
  // ~31 distinct words — replay is distinct-word-bounded, |merges|
  // multiplies the per-step scan only.
  // ---------------------------------------------------------------
  def q206LargeVocabCompression(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenizerCompressionBy(
      Tables.documents(spark, d), col("source"), col("text"),
      BpeVocab.large)
      .withColumnRenamed("group_key", "source")

  val q206Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes(BpeVocab.large)}
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(octet_length(encode(d.text))) AS BIGINT) AS total_bytes,
       |  CAST(SUM(t.bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       |  CASE WHEN SUM(t.bpe_tokens) > 0 THEN
       |    CAST(SUM(octet_length(encode(d.text))) AS DOUBLE)
       |      / CAST(SUM(t.bpe_tokens) AS DOUBLE)
       |  END AS bytes_per_token
       |FROM documents d JOIN dtok t USING (doc_id)
       |WHERE d.source IS NOT NULL AND d.text IS NOT NULL
       |GROUP BY d.source""".stripMargin

  // ---------------------------------------------------------------
  // q207 — REAL-decode audio census (the audio leg of q204's
  // pattern): the fixture synthesizes an actual RIFF/WAVE payload
  // per audio-rotation doc at a duration derived from the portable
  // md5-prefix integer (q203's stand-in convention made physical),
  // runs the REAL header probe through decodeFeatures, and prices
  // speech-encoder tokens from the PROBED duration_ms; the oracle
  // restates the generator arithmetic. A hash match proves the WAV
  // header walk round-trips (a stub fallback would read format
  // 'synthetic' with hash-derived duration and diverge on both
  // n_wav and the token totals). Video has the same real-decode leg
  // via the RIFF/AVI and ISO BMFF walks (q208/q210), audio's BMFF
  // (m4a) leg is q211; only genuinely exotic containers fall back
  // to the stub.
  // ---------------------------------------------------------------
  private def q207AudioDimsFixture(
      spark: SparkSession, d: String, owner: String): DataFrame =
    QueryFixtures.ensure(spark, d, "q207_audio_dims", owner) {
      import spark.implicits._
      val p = graft.functions.Md5Expressions.md5PrefixLong(col("text"), 8)
      val media = Tables.documents(spark, d)
        .filter(pmod(col("doc_id"), lit(3)) === 1 &&
          col("source").isNotNull && col("text").isNotNull)
        .select(col("doc_id").as("_1"), col("source").as("_2"),
          (lit(1000L) + pmod(p, lit(60000L))).as("_3"))
        .as[(Long, String, Long)]
        .map { case (id, src, ms) =>
          graft.operators.Multimodal.MediaItem(id, "audio",
            graft.operators.Multimodal.synthesizeWav(ms), src) }
        .toDF()
      graft.operators.Multimodal.decodeFeatures(spark, media, partitions = 32)
        .select(col("media_id"), col("duration_ms"), col("format"))
    }

  def q207RealAudioCensus(spark: SparkSession, d: String): DataFrame = {
    val M = graft.operators.Multimodal
    val dims = q207AudioDimsFixture(spark, d, "q207_real_audio_census")
    dims.join(
        Tables.documents(spark, d)
          .select(col("doc_id").as("media_id"), col("source")),
        Seq("media_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_clips"),
        sum(when(col("format") === "wav", 1L).otherwise(0L)).as("n_wav"),
        sum(col("duration_ms")).as("total_ms"),
        sum(M.audioTokens(col("duration_ms"), AudioTokensPerSecond))
          .as("total_audio_tokens"))
  }

  val q207Sql: String =
    s"""WITH au AS (
       |  SELECT source,
       |    1000 + CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) % 60000
       |      AS ms
       |  FROM documents
       |  WHERE doc_id % 3 = 1 AND source IS NOT NULL AND text IS NOT NULL)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_clips,
       |  CAST(COUNT(*) AS BIGINT) AS n_wav,
       |  CAST(SUM(ms) AS BIGINT) AS total_ms,
       |  CAST(SUM((ms * $AudioTokensPerSecond + 999) // 1000) AS BIGINT)
       |    AS total_audio_tokens
       |FROM au GROUP BY source""".stripMargin

  // ---------------------------------------------------------------
  // q208 — REAL-decode video census (the third modality leg,
  // completing q204/q207's pattern): the fixture synthesizes an
  // actual RIFF/AVI header payload per video-rotation doc — width/
  // height from the md5-prefix integer (q204's image convention),
  // frame count 1 + p % 240 at 30 fps (33333 µs/frame) — runs the
  // REAL avih main-header walk through decodeFeatures, and prices
  // videoTokens (sampled frames × ViT patches) from the PROBED
  // dimensions plus the probed container duration. The oracle
  // restates the generator arithmetic; a hash match proves the AVI
  // header walk round-trips (stub fallback would flip format and
  // hash-diverge on dims, duration, and token totals alike).
  // ---------------------------------------------------------------
  private val AviUsPerFrame = 33333L

  private def q208VideoDimsFixture(
      spark: SparkSession, d: String, owner: String): DataFrame =
    QueryFixtures.ensure(spark, d, "q208_video_dims", owner) {
      import spark.implicits._
      val p = graft.functions.Md5Expressions.md5PrefixLong(col("text"), 8)
      val media = Tables.documents(spark, d)
        .filter(pmod(col("doc_id"), lit(3)) === 2 &&
          col("source").isNotNull && col("text").isNotNull)
        .select(col("doc_id").as("_1"), col("source").as("_2"),
          (lit(16L) + pmod(p, lit(256L))).cast("int").as("_3"),
          (lit(16L) + pmod(shiftright(p, 8), lit(256L))).cast("int").as("_4"),
          (lit(1L) + pmod(p, lit(240L))).cast("int").as("_5"))
        .as[(Long, String, Int, Int, Int)]
        .map { case (id, src, w, h, frames) =>
          graft.operators.Multimodal.MediaItem(id, "video",
            graft.operators.Multimodal.synthesizeAvi(w, h, frames,
              AviUsPerFrame.toInt), src) }
        .toDF()
      graft.operators.Multimodal.decodeFeatures(spark, media, partitions = 32)
        .select(col("media_id"), col("width"), col("height"),
          col("duration_ms"), col("format"))
    }

  def q208RealVideoCensus(spark: SparkSession, d: String): DataFrame = {
    val M = graft.operators.Multimodal
    val dims = q208VideoDimsFixture(spark, d, "q208_real_video_census")
    dims.join(
        Tables.documents(spark, d)
          .select(col("doc_id").as("media_id"), col("source")),
        Seq("media_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_videos"),
        sum(when(col("format") === "avi", 1L).otherwise(0L)).as("n_avi"),
        sum(col("duration_ms")).as("total_ms"),
        sum(M.videoTokens(col("width"), col("height"), VideoFrames, PatchSize))
          .as("total_video_tokens"))
  }

  val q208Sql: String =
    s"""WITH vi AS (
       |  SELECT source,
       |    CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) AS p
       |  FROM documents
       |  WHERE doc_id % 3 = 2 AND source IS NOT NULL AND text IS NOT NULL)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_videos,
       |  CAST(COUNT(*) AS BIGINT) AS n_avi,
       |  CAST(SUM(($AviUsPerFrame * (1 + p % 240)) // 1000) AS BIGINT)
       |    AS total_ms,
       |  CAST(SUM($VideoFrames * (${patchTokensSql(
             "16 + p % 256", "16 + (p // 256) % 256")})) AS BIGINT)
       |    AS total_video_tokens
       |FROM vi GROUP BY source""".stripMargin

  // ---------------------------------------------------------------
  // q210 — MIXED-CONTAINER real-decode video census: the same
  // video-rotation docs as q208, but even ids ship RIFF/AVI and odd
  // ids ship ISO BMFF (mp4) — one fixture, one decodeFeatures pass,
  // and the census counts per-container legs from the PROBED format
  // plus totals from the probed dims/durations. A hash match proves
  // both container walks round-trip AND that the codec's dispatch
  // (AVI walk first, then the mp4 box walk, stub last) routes every
  // payload to the right probe — a stub fallback or cross-container
  // misroute flips n_avi/n_mp4 and the totals. The oracle restates
  // the generator arithmetic per container branch.
  // ---------------------------------------------------------------
  private def q210MixedVideoDimsFixture(
      spark: SparkSession, d: String, owner: String): DataFrame =
    QueryFixtures.ensure(spark, d, "q210_mixed_video_dims", owner) {
      import spark.implicits._
      val p = graft.functions.Md5Expressions.md5PrefixLong(col("text"), 8)
      val media = Tables.documents(spark, d)
        .filter(pmod(col("doc_id"), lit(3)) === 2 &&
          col("source").isNotNull && col("text").isNotNull)
        .select(col("doc_id").as("_1"), col("source").as("_2"),
          (lit(16L) + pmod(p, lit(256L))).cast("int").as("_3"),
          (lit(16L) + pmod(shiftright(p, 8), lit(256L))).cast("int").as("_4"),
          (lit(1L) + pmod(p, lit(240L))).cast("int").as("_5"),
          (lit(1000L) + pmod(p, lit(60000L))).as("_6"))
        .as[(Long, String, Int, Int, Int, Long)]
        .map { case (id, src, w, h, frames, ms) =>
          val payload =
            if (id % 2 == 0)
              graft.operators.Multimodal.synthesizeAvi(w, h, frames,
                AviUsPerFrame.toInt)
            else graft.operators.Multimodal.synthesizeMp4(w, h, ms)
          graft.operators.Multimodal.MediaItem(id, "video", payload, src) }
        .toDF()
      graft.operators.Multimodal.decodeFeatures(spark, media, partitions = 32)
        .select(col("media_id"), col("width"), col("height"),
          col("duration_ms"), col("format"))
    }

  def q210MixedVideoCensus(spark: SparkSession, d: String): DataFrame = {
    val M = graft.operators.Multimodal
    val dims = q210MixedVideoDimsFixture(spark, d, "q210_mixed_video_census")
    dims.join(
        Tables.documents(spark, d)
          .select(col("doc_id").as("media_id"), col("source")),
        Seq("media_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_videos"),
        sum(when(col("format") === "avi", 1L).otherwise(0L)).as("n_avi"),
        sum(when(col("format") === "mp4", 1L).otherwise(0L)).as("n_mp4"),
        sum(col("duration_ms")).as("total_ms"),
        sum(M.videoTokens(col("width"), col("height"), VideoFrames, PatchSize))
          .as("total_video_tokens"))
  }

  val q210Sql: String =
    s"""WITH vi AS (
       |  SELECT source, doc_id,
       |    CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) AS p
       |  FROM documents
       |  WHERE doc_id % 3 = 2 AND source IS NOT NULL AND text IS NOT NULL)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_videos,
       |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_avi,
       |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
       |    AS n_mp4,
       |  CAST(SUM(CASE WHEN doc_id % 2 = 0
       |      THEN ($AviUsPerFrame * (1 + p % 240)) // 1000
       |      ELSE 1000 + p % 60000 END) AS BIGINT) AS total_ms,
       |  CAST(SUM($VideoFrames * (${patchTokensSql(
             "16 + p % 256", "16 + (p // 256) % 256")})) AS BIGINT)
       |    AS total_video_tokens
       |FROM vi GROUP BY source""".stripMargin

  // ---------------------------------------------------------------
  // q211 — MIXED-CONTAINER real-decode audio census (the audio twin
  // of q210): the same audio-rotation docs as q207, but even ids
  // ship RIFF/WAVE and odd ids ship ISO BMFF (m4a) — one fixture,
  // one decodeFeatures pass, and the census counts per-container
  // legs from the PROBED format plus totals from the probed
  // durations. A hash match proves both audio walks round-trip AND
  // that the codec's audio dispatch (WAV walk first, then the BMFF
  // mvhd walk, stub last) routes every payload to the right probe —
  // a stub fallback or misroute flips n_wav/n_m4a and, because the
  // stub's hash-derived duration diverges from the generator's,
  // total_ms and the token totals too. The oracle restates the
  // generator arithmetic per container branch (both branches carry
  // the same md5-derived duration, so only the format split differs).
  // ---------------------------------------------------------------
  private def q211MixedAudioDimsFixture(
      spark: SparkSession, d: String, owner: String): DataFrame =
    QueryFixtures.ensure(spark, d, "q211_mixed_audio_dims", owner) {
      import spark.implicits._
      val p = graft.functions.Md5Expressions.md5PrefixLong(col("text"), 8)
      val media = Tables.documents(spark, d)
        .filter(pmod(col("doc_id"), lit(3)) === 1 &&
          col("source").isNotNull && col("text").isNotNull)
        .select(col("doc_id").as("_1"), col("source").as("_2"),
          (lit(1000L) + pmod(p, lit(60000L))).as("_3"))
        .as[(Long, String, Long)]
        .map { case (id, src, ms) =>
          val payload =
            if (id % 2 == 0) graft.operators.Multimodal.synthesizeWav(ms)
            else graft.operators.Multimodal.synthesizeM4a(ms)
          graft.operators.Multimodal.MediaItem(id, "audio", payload, src) }
        .toDF()
      graft.operators.Multimodal.decodeFeatures(spark, media, partitions = 32)
        .select(col("media_id"), col("duration_ms"), col("format"))
    }

  def q211MixedAudioCensus(spark: SparkSession, d: String): DataFrame = {
    val M = graft.operators.Multimodal
    val dims = q211MixedAudioDimsFixture(spark, d, "q211_mixed_audio_census")
    dims.join(
        Tables.documents(spark, d)
          .select(col("doc_id").as("media_id"), col("source")),
        Seq("media_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_clips"),
        sum(when(col("format") === "wav", 1L).otherwise(0L)).as("n_wav"),
        sum(when(col("format") === "m4a", 1L).otherwise(0L)).as("n_m4a"),
        sum(col("duration_ms")).as("total_ms"),
        sum(M.audioTokens(col("duration_ms"), AudioTokensPerSecond))
          .as("total_audio_tokens"))
  }

  val q211Sql: String =
    s"""WITH au AS (
       |  SELECT source, doc_id,
       |    1000 + CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) % 60000
       |      AS ms
       |  FROM documents
       |  WHERE doc_id % 3 = 1 AND source IS NOT NULL AND text IS NOT NULL)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_clips,
       |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_wav,
       |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
       |    AS n_m4a,
       |  CAST(SUM(ms) AS BIGINT) AS total_ms,
       |  CAST(SUM((ms * $AudioTokensPerSecond + 999) // 1000) AS BIGINT)
       |    AS total_audio_tokens
       |FROM au GROUP BY source""".stripMargin

  // ---------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q181_bpe_token_stats"   -> (q181BpeTokenStats _),
    "q182_bpe_packing"       -> (q182BpePacking _),
    "q183_bpe_chunks"        -> (q183BpeChunks _),
    "q184_bpe_budget_sample" -> (q184BpeBudgetSample _),
    "q185_lm_doc_scores"     -> (q185LmDocScores _),
    "q186_lm_source_gate"    -> (q186LmSourceGate _),
    "q187_bpe_vocab_census"  -> (q187BpeVocabCensus _),
    "q188_bpe_name_fertility" -> (q188BpeNameFertility _),
    "q190_lm_gate_sweep"      -> (q190LmGateSweep _),
    "q192_bpe_word_slice"     -> (q192BpeWordSlice _),
    "q193_token_mixture_plan" -> (q193TokenMixturePlan _),
    "q194_source_entropy"     -> (q194SourceEntropy _),
    "q195_zipf_slope"         -> (q195ZipfSlope _),
    "q196_dedup_token_accounting" -> (q196DedupTokenAccounting _),
    "q197_dedup_mixture_plan" -> (q197DedupMixturePlan _),
    "q198_prod_name_fertility" -> (q198ProdNameFertility _),
    "q199_neardup_token_accounting" -> (q199NearDupTokenAccounting _),
    "q200_neardup_mixture_plan" -> (q200NearDupMixturePlan _),
    "q201_multimodal_mixture_plan" -> (q201MultimodalMixturePlan _),
    "q202_tokenizer_compression" -> (q202TokenizerCompression _),
    "q203_media_token_census" -> (q203MediaTokenCensus _),
    "q204_real_decode_census" -> (q204RealDecodeCensus _),
    "q205_large_vocab_fertility" -> (q205LargeVocabFertility _),
    "q206_large_vocab_compression" -> (q206LargeVocabCompression _),
    "q207_real_audio_census" -> (q207RealAudioCensus _),
    "q208_real_video_census" -> (q208RealVideoCensus _),
    "q210_mixed_video_census" -> (q210MixedVideoCensus _),
    "q211_mixed_audio_census" -> (q211MixedAudioCensus _))

  val oracleSql: Map[String, String] = Map(
    "q181_bpe_token_stats"   -> q181Sql,
    "q182_bpe_packing"       -> q182Sql,
    "q183_bpe_chunks"        -> q183Sql,
    "q184_bpe_budget_sample" -> q184Sql,
    "q185_lm_doc_scores"     -> q185Sql,
    "q186_lm_source_gate"    -> q186Sql,
    "q187_bpe_vocab_census"  -> q187Sql,
    "q188_bpe_name_fertility" -> q188Sql,
    "q190_lm_gate_sweep"      -> q190Sql,
    "q192_bpe_word_slice"     -> q192Sql,
    "q193_token_mixture_plan" -> q193Sql,
    "q194_source_entropy"     -> q194Sql,
    "q195_zipf_slope"         -> q195Sql,
    "q196_dedup_token_accounting" -> q196Sql,
    "q197_dedup_mixture_plan" -> q197Sql,
    "q198_prod_name_fertility" -> q198Sql,
    "q199_neardup_token_accounting" -> q199Sql,
    "q200_neardup_mixture_plan" -> q200Sql,
    "q201_multimodal_mixture_plan" -> q201Sql,
    "q202_tokenizer_compression" -> q202Sql,
    "q203_media_token_census" -> q203Sql,
    "q204_real_decode_census" -> q204Sql,
    "q205_large_vocab_fertility" -> q205Sql,
    "q206_large_vocab_compression" -> q206Sql,
    "q207_real_audio_census" -> q207Sql,
    "q208_real_video_census" -> q208Sql,
    "q210_mixed_video_census" -> q210Sql,
    "q211_mixed_audio_census" -> q211Sql)
}
