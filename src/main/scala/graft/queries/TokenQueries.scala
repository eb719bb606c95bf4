package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Bpe, BpeVocab}
import graft.operators.{Packing, Sampling, TextAnalysis}

/** Real-token queries: the q19/q61/q66/q97 family re-denominated in
  * REAL BPE tokens (the embedded trained [[BpeVocab]]) instead of the
  * `bpeishTokenCount` regex approximation. The original rows are kept
  * — these are the `_bpe` forms the r11 verdict asked for: token
  * budgets, packing, and chunking measured in the unit a model's
  * context window and a training run's token budget actually use.
  *
  * Oracle discipline: the ONE embedded merge-table literal renders
  * both the engine's rank map and the DuckDB `merges` VALUES table;
  * the oracle replays the full BPE merge loop per DISTINCT word in a
  * recursive CTE ([[BpeVocab.docTokensCtes]]), so every count below
  * is exact-integer-checked end to end, not spot-checked.
  */
object TokenQueries {

  /** Same [0,1) hash score as Sampling.hashScore, stated in DuckDB. */
  private def scoreSql(alias: String) =
    s"CAST(CAST(('0x' || substr(md5(CAST($alias.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE) / 4294967296.0"

  private def withBpeTokens(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("bpe_tokens", Bpe.bpeTokenCount(col("text")).cast("long"))

  // ---------------------------------------------------------------
  // q181 — real-token stats per lang (the q19 surface, real tokens):
  // docs, BPE tokens, pre-tokens (words), and the fertility ratio
  // tokens/word — the number a tokenizer swap actually moves.
  // ---------------------------------------------------------------
  def q181BpeTokenStats(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("lang"),
        Bpe.bpeTokenCount(col("text")).cast("long").as("_bt"),
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
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes()}
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
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes()},
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
      "doc_id", "text", BpeChunkBudget)

  val q183Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes()},
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
  // keep a deterministic ~80k-BPE-token subset, not a char budget.
  // ---------------------------------------------------------------
  private val BpeTokenBudget = 80000L
  private val BpeBudgetBuckets = 4096

  def q184BpeBudgetSample(spark: SparkSession, d: String): DataFrame =
    Sampling.sampleToBudget(withBpeTokens(spark, d), "doc_id",
        col("bpe_tokens"), BpeTokenBudget, BpeBudgetBuckets)
      .select(col("doc_id"), col("bpe_tokens"))

  val q184Sql: String =
    s"""WITH RECURSIVE ${BpeVocab.docTokensCtes()},
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q181_bpe_token_stats"   -> (q181BpeTokenStats _),
    "q182_bpe_packing"       -> (q182BpePacking _),
    "q183_bpe_chunks"        -> (q183BpeChunks _),
    "q184_bpe_budget_sample" -> (q184BpeBudgetSample _))

  val oracleSql: Map[String, String] = Map(
    "q181_bpe_token_stats"   -> q181Sql,
    "q182_bpe_packing"       -> q182Sql,
    "q183_bpe_chunks"        -> q183Sql,
    "q184_bpe_budget_sample" -> q184Sql)
}
