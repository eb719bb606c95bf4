package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.DqFunctions._
import graft.operators.{Dedup, Similarity, TextAnalysis, Multimodal}

/** Training-data-pipeline extension queries (SURVEY.md §7.2 M5):
  * dedup, similarity search, text analysis, multimodal plumbing.
  *
  * Oracle-checkable queries keep every floating-point computation as
  * the same sequential left-fold in both engines, so doubles match
  * bit-for-bit. MinHash/SimHash/LSH queries have no DuckDB oracle
  * (no xxhash64 there) → rows-only checks; their correctness is
  * pinned by ScalaTest specs against the exact operators instead.
  */
object ExtensionQueries {

  // Near-dup thresholds chosen against the corpus with a wide empty
  // margin (no pair within ~1e-3 of either cutoff at sf0.01/sf0.1):
  // jaccard: planted near-dups sit ≥0.92, background ≤0.74.
  private val JaccardThreshold = 0.8
  private val CosineThreshold  = 0.4

  // q11 runs the *exact* inverted-index pair join, which is quadratic
  // in hot-shingle document frequency — capped to a fixed id range so
  // the demonstration stays exact at every SF; the scale path for the
  // full corpus is the LSH query q12.
  private val ExactPairIdCap = 500

  // ---------------------------------------------------------------
  // q10 — exact dedup: hash-groupBy duplicate groups.
  // ---------------------------------------------------------------
  def q10DedupExact(spark: SparkSession, d: String): DataFrame =
    Dedup.exactDuplicateGroups(Tables.documents(spark, d), "doc_id", col("text"))

  val q10Sql: String =
    """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
      |  CAST(COUNT(*) AS BIGINT) AS dup_count
      |FROM documents GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q11 — exact n-gram Jaccard near-dup pairs (inverted shingle
  // index; no cross join).
  // ---------------------------------------------------------------
  def q11NgramJaccard(spark: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(
      Tables.documents(spark, d).filter(col("doc_id") < ExactPairIdCap),
      "doc_id", "text", n = 3, threshold = JaccardThreshold)

  val q11Sql: String =
    s"""WITH docs AS (SELECT * FROM documents WHERE doc_id < $ExactPairIdCap),
       |sh AS (SELECT doc_id, list_distinct(
       |    [substr(text, i, 3) for i in range(1, greatest(length(text) - 2, 1) + 1)]) AS s
       |  FROM docs),
       |sz AS (SELECT doc_id, len(s) AS sz FROM sh),
       |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |inter AS (
       |  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS i
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT ia AS id_a, ib AS id_b,
       |  CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
       |FROM inter JOIN sz sa ON ia = sa.doc_id JOIN sz sb ON ib = sb.doc_id
       |WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= $JaccardThreshold""".stripMargin

  // ---------------------------------------------------------------
  // q12 — MinHash + LSH banding candidates (the 100 TB dedup path).
  // No SQL oracle (xxhash64); spec-verified against q11's exact
  // pairs (LSH recall) instead. Output: high-estimate candidates.
  // ---------------------------------------------------------------
  def q12MinhashLsh(spark: SparkSession, d: String): DataFrame =
    Dedup.lshCandidatePairs(Tables.documents(spark, d),
        "doc_id", "text", n = 3, numHashes = 64, bands = 8)
      .filter(col("est_jaccard") >= JaccardThreshold)

  // ---------------------------------------------------------------
  // q13 — SimHash near-dup pairs (banded Hamming ≤ 3).
  // No SQL oracle (xxhash64); deterministic, spec-pinned.
  // ---------------------------------------------------------------
  def q13SimhashNearDup(spark: SparkSession, d: String): DataFrame =
    Dedup.simhashNearDupPairs(Tables.documents(spark, d), "doc_id", "text", maxHamming = 3)

  // ---------------------------------------------------------------
  // q14 — embedding-cosine near-dup pairs (exact brute baseline).
  // ---------------------------------------------------------------
  def q14EmbeddingNearDup(spark: SparkSession, d: String): DataFrame =
    Dedup.embeddingNearDupBrute(
      Tables.embeddings(spark, d), "vec_id", "embedding", CosineThreshold)

  /** The oracle mirrors the engine's exact float→double sequential
    * fold: dot / (sqrt(Σa²) · sqrt(Σb²)) in index order.
    */
  val q14Sql: String =
    s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
       |p AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
       |    (sqrt(list_sum(list_transform(range(1, 65),
       |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
       |     sqrt(list_sum(list_transform(range(1, 65),
       |      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
       |    AS cosine
       |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cosine FROM p WHERE cosine >= $CosineThreshold""".stripMargin

  // ---------------------------------------------------------------
  // q15 — brute-force cosine top-k for a fixed query vector
  // (vec_id 0; k-th/(k+1)-th neighbor gap verified wide).
  // ---------------------------------------------------------------
  private val KnnK = 10

  def q15KnnBrute(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    // 1-row config-style lookup → literal (SURVEY.md §4.2 J2 pattern)
    val q = Similarity.rowVecToDoubles(
      emb.filter(col("vec_id") === 0).select(col("embedding")).head())
    Similarity.bruteForceTopK(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", q, KnnK)
      .withColumnRenamed("id", "vec_id")
  }

  val q15Sql: String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id,
       |  list_sum(list_transform(range(1, 65),
       |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) /
       |  (sqrt(list_sum(list_transform(range(1, 65),
       |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) *
       |   sqrt(list_sum(list_transform(range(1, 65),
       |    i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))))
       |  AS cosine
       |FROM embeddings e, q WHERE vec_id <> 0
       |ORDER BY cosine DESC, vec_id LIMIT $KnnK""".stripMargin

  // ---------------------------------------------------------------
  // q16 — LSH-bucketed ANN top-k (the scale path; rows-only check,
  // recall vs q15 pinned in the spec).
  // ---------------------------------------------------------------
  def q16KnnLsh(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    val q = Similarity.rowVecToDoubles(
      emb.filter(col("vec_id") === 0).select(col("embedding")).head())
    // planes=6 / probe≤2 scans ~1/3 of buckets; on this corpus (no
    // true high-cosine neighbors, best ≈ 0.37 ⇒ θ ≈ 68°) hyperplane
    // LSH recall is ~0.6 — the honest ANN trade-off; for the dedup
    // regime (cosine → 1) the same parameters give recall → 1.
    Similarity.lshTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        q, KnnK, dim = 64, planes = 6, probeHamming = 2)
      .withColumnRenamed("id", "vec_id")
  }

  // ---------------------------------------------------------------
  // q17 — language ID (marker-substring heuristic, argmax with
  // deterministic tie-break).
  // ---------------------------------------------------------------
  def q17LangId(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred"))

  val q17Sql: String = {
    def cnt(m: String) =
      s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS INT)"
    val scores = TextAnalysis.LangMarkers.map { case (lang, ms) =>
      lang -> ms.map(cnt).mkString(" + ")
    }
    val scoreCols = scores.map { case (l, e) => s"($e) AS s_$l" }.mkString(",\n    ")
    val best = s"greatest(${scores.map("s_" + _._1).mkString(", ")})"
    val cases = scores.map { case (l, _) =>
      s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
    }.mkString(" ")
    s"""WITH p0 AS (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents),
       |sc AS (SELECT doc_id, lang,
       |    $scoreCols
       |  FROM p0),
       |b AS (SELECT *, $best AS best FROM sc)
       |SELECT doc_id, lang, CASE $cases ELSE 'und' END AS lang_pred FROM b""".stripMargin
  }

  // ---------------------------------------------------------------
  // q18 — text quality features.
  // ---------------------------------------------------------------
  def q18TextQuality(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityFeatures(Tables.documents(spark, d), "doc_id", "text")

  val q18Sql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish_tokens,
      |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
      |  CASE WHEN length(text) > 0 THEN
      |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
      |      / CAST(length(text) AS DOUBLE) ELSE 0.0 END AS punct_ratio,
      |  CASE WHEN len(regexp_extract_all(text, '\S+')) > 0 THEN
      |    CAST(CAST((length(p) - length(replace(p, ' the ', ''))) / 5 AS INT)
      |       + CAST((length(p) - length(replace(p, ' a ', ''))) / 3 AS INT)
      |       + CAST((length(p) - length(replace(p, ' and ', ''))) / 5 AS INT)
      |       + CAST((length(p) - length(replace(p, ' of ', ''))) / 4 AS INT)
      |       + CAST((length(p) - length(replace(p, ' is ', ''))) / 4 AS INT)
      |       + CAST((length(p) - length(replace(p, ' in ', ''))) / 4 AS INT) AS DOUBLE)
      |      / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) ELSE 0.0 END AS stopword_ratio,
      |  CASE WHEN len(regexp_extract_all(text, '\S+')) > 0 THEN
      |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
      |      / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) ELSE 0.0 END AS mean_word_len
      |FROM (SELECT *, ' ' || text || ' ' AS p FROM documents)""".stripMargin

  // ---------------------------------------------------------------
  // q19 — per-language token statistics.
  // ---------------------------------------------------------------
  def q19TokenStats(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenStats(Tables.documents(spark, d), "lang", "text")

  val q19Sql: String =
    """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
      |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpeish_tokens,
      |  CAST(SUM(length(text)) AS BIGINT) AS total_chars
      |FROM documents GROUP BY lang""".stripMargin

  // ---------------------------------------------------------------
  // q20 — document fingerprints (sha256 of normalized text).
  // ---------------------------------------------------------------
  def q20Fingerprint(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), contentFingerprint(col("text")).as("sha256_fingerprint"))

  val q20Sql: String =
    """SELECT doc_id,
      |  sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS sha256_fingerprint
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------
  // q21 — multimodal metadata: opaque binary payload + typed meta.
  // (The stubbed decode path is spec-tested; this query checks the
  // binary-column plumbing end-to-end against the oracle.)
  // ---------------------------------------------------------------
  def q21MultimodalMeta(spark: SparkSession, d: String): DataFrame =
    Multimodal.mediaTable(Tables.documents(spark, d), "doc_id", "text", "source")
      .select(col("media_id"), col("kind"),
        length(col("payload")).cast("bigint").as("n_bytes"),
        sha2(col("payload"), 256).as("payload_sha256"))

  val q21Sql: String =
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  sha256(text) AS payload_sha256
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q10_dedup_exact"       -> (q10DedupExact _),
    "q11_ngram_jaccard"     -> (q11NgramJaccard _),
    "q12_minhash_lsh"       -> (q12MinhashLsh _),
    "q13_simhash_neardup"   -> (q13SimhashNearDup _),
    "q14_embedding_neardup" -> (q14EmbeddingNearDup _),
    "q15_knn_brute"         -> (q15KnnBrute _),
    "q16_knn_lsh"           -> (q16KnnLsh _),
    "q17_lang_id"           -> (q17LangId _),
    "q18_text_quality"      -> (q18TextQuality _),
    "q19_token_stats"       -> (q19TokenStats _),
    "q20_fingerprint"       -> (q20Fingerprint _),
    "q21_multimodal_meta"   -> (q21MultimodalMeta _))

  /** q12/q13/q16 are deliberately absent: xxhash64-based, not
    * SQL-oracle-expressible → driver records rows-only checks.
    */
  val oracleSql: Map[String, String] = Map(
    "q10_dedup_exact"       -> q10Sql,
    "q11_ngram_jaccard"     -> q11Sql,
    "q14_embedding_neardup" -> q14Sql,
    "q15_knn_brute"         -> q15Sql,
    "q17_lang_id"           -> q17Sql,
    "q18_text_quality"      -> q18Sql,
    "q19_token_stats"       -> q19Sql,
    "q20_fingerprint"       -> q20Sql,
    "q21_multimodal_meta"   -> q21Sql)
}
