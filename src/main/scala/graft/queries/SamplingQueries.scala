package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sampling

/** Deterministic-sampling queries: reproducible train/val/test
  * splits and stratified downsampling, oracle-checked — the md5-based
  * sampling predicate is stated identically in DuckDB.
  */
object SamplingQueries {

  // ---------------------------------------------------------------
  // q26 — three-way deterministic split of documents with per-split
  // counts (the reproducibility property: same rows, same splits,
  // every run, both engines).
  // ---------------------------------------------------------------
  def q26DeterministicSplit(spark: SparkSession, d: String): DataFrame =
    Sampling.deterministicSplit(Tables.documents(spark, d), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))

  /** Same hash → [0,1) score in DuckDB: first 8 md5 hex digits / 2³². */
  private val scoreSql =
    "CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE) / 4294967296.0"

  val q26Sql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, $scoreSql AS s FROM documents),
       |labeled AS (
       |  SELECT doc_id,
       |    CASE WHEN s < 0.8 THEN 'train'
       |         WHEN s < 0.9 THEN 'val'
       |         WHEN s < 1.0 THEN 'test' END AS split
       |  FROM scored)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS min_doc_id
       |FROM labeled GROUP BY split""".stripMargin

  // ---------------------------------------------------------------
  // q27 — stratified downsample: keep 20% of 'en' docs, all others —
  // the class-rebalancing pattern. Output is the kept doc ids.
  // ---------------------------------------------------------------
  def q27StratifiedSample(spark: SparkSession, d: String): DataFrame =
    Sampling.stratifiedSample(Tables.documents(spark, d), "doc_id", "lang",
        Map("en" -> 0.2), defaultFraction = 1.0)
      .select(col("doc_id"), col("lang"))

  val q27Sql: String =
    s"""SELECT doc_id, lang FROM documents
       |WHERE $scoreSql < CASE WHEN lang = 'en' THEN 0.2 ELSE 1.0 END""".stripMargin

  // ---------------------------------------------------------------
  // q57 — per-source cap (domain balancing): keep a deterministic
  // uniform 10-subset of every source. Only (id, source, score)
  // triples ride the window shuffle; payload joins back by id.
  // ---------------------------------------------------------------
  private val SourceCap = 10

  def q57SourceCap(spark: SparkSession, d: String): DataFrame =
    Sampling.capPerGroup(Tables.documents(spark, d), "doc_id", "source", SourceCap)
      .select(col("doc_id"), col("source"), col("sample_rank"))

  val q57Sql: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY $scoreSql, doc_id)
       |      AS sample_rank
       |  FROM documents)
       |SELECT doc_id, source, CAST(sample_rank AS BIGINT) AS sample_rank
       |FROM ranked WHERE sample_rank <= $SourceCap""".stripMargin

  // ---------------------------------------------------------------
  // q61 — sequence packing: documents greedily packed into ≤8
  // parallel shards of 4000-char-budget packs (the pretraining
  // batch-layout primitive). Shard, order, and boundary division are
  // all portable md5/double arithmetic, so DuckDB replays the whole
  // packer and the pack census hash-matches.
  // ---------------------------------------------------------------
  private val PackBudget = 4000L
  private val PackShards = 8

  def q61Packing(spark: SparkSession, d: String): DataFrame =
    graft.operators.Packing.packSummary(
      Tables.documents(spark, d), "doc_id", "n_chars", PackBudget, PackShards)

  val q61Sql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, n_chars,
       |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 4)) AS UBIGINT) AS BIGINT)
       |      % $PackShards AS shard,
       |    $scoreSql AS s
       |  FROM documents),
       |packed AS (
       |  SELECT shard, doc_id, n_chars,
       |    CAST(floor(CAST(sum(n_chars) OVER (PARTITION BY shard ORDER BY s, doc_id
       |        ROWS UNBOUNDED PRECEDING) - n_chars AS DOUBLE) / ${PackBudget}.0)
       |      AS BIGINT) AS pack_id
       |  FROM scored)
       |SELECT shard, pack_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_size,
       |  min(doc_id) AS min_id
       |FROM packed GROUP BY shard, pack_id""".stripMargin

  // ---------------------------------------------------------------
  // q64 — quality-ranked per-source cap: keep each source's LONGEST
  // 10 documents (score = n_chars) instead of a uniform subset —
  // same salted two-phase window machinery as q57, explicit score.
  // ---------------------------------------------------------------
  def q64QualityCap(spark: SparkSession, d: String): DataFrame =
    Sampling.capPerGroupBy(Tables.documents(spark, d), "doc_id", "source",
        SourceCap, scoreCol = col("n_chars"))
      .select(col("doc_id"), col("source"), col("sample_rank"))

  val q64Sql: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)
       |      AS sample_rank
       |  FROM documents)
       |SELECT doc_id, source, CAST(sample_rank AS BIGINT) AS sample_rank
       |FROM ranked WHERE sample_rank <= $SourceCap""".stripMargin

  // ---------------------------------------------------------------
  // q70 — weighted sample without replacement (priority sampling):
  // the 100 documents with the largest n_chars/u priority — "sample
  // the corpus by length mass, not doc count". The priority is one
  // IEEE division of portable operands, so both engines rank the
  // identical row set (the pow/ln-free formulation is the point).
  // ---------------------------------------------------------------
  private val PriorityK = 100

  def q70PrioritySample(spark: SparkSession, d: String): DataFrame =
    Sampling.prioritySample(Tables.documents(spark, d), "doc_id",
        col("n_chars"), PriorityK)
      .select(col("doc_id"), col("source"), col("n_chars"), col("priority_rank"))

  /** (h+1)/2³² ∈ (0,1] — the operator's div-safe shifted score. */
  private val shiftedScoreSql =
    "((CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE) + 1.0) / 4294967296.0)"

  val q70Sql: String =
    s"""WITH ranked AS (
       |  SELECT doc_id, source, n_chars,
       |    row_number() OVER (
       |      ORDER BY CAST(n_chars AS DOUBLE) / $shiftedScoreSql DESC, doc_id)
       |      AS priority_rank
       |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
       |SELECT doc_id, source, n_chars, CAST(priority_rank AS BIGINT) AS priority_rank
       |FROM ranked WHERE priority_rank <= $PriorityK""".stripMargin

  // ---------------------------------------------------------------
  // q71 — source mixing to a row budget: resample three sources
  // toward a 50/30/20 mix of ~120 rows total. Keep fractions are
  // min(1, budget·w/n) from a one-aggregate census; the kept-doc
  // census below is what's compared (ids + per-source counts).
  // ---------------------------------------------------------------
  private val MixBudget = 120L
  private val MixWeights = Seq("src3" -> 0.5, "src7" -> 0.3, "src12" -> 0.2)

  def q71SourceMixture(spark: SparkSession, d: String): DataFrame =
    Sampling.mixToBudget(Tables.documents(spark, d), "doc_id", "source",
        MixWeights.toMap, MixBudget)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_doc_id"),
        max(col("keep_fraction")).as("keep_fraction"))

  val q71Sql: String = {
    val weightCase = MixWeights
      .map { case (g, w) => s"WHEN d.source = '$g' THEN $w" }
      .mkString(" ")
    s"""WITH census AS (
       |  SELECT source, count(*) AS n_group FROM documents GROUP BY source),
       |eligible AS (
       |  SELECT d.doc_id, d.source,
       |    least(1.0, ${MixBudget}.0 * (CASE $weightCase END)
       |      / CAST(c.n_group AS DOUBLE)) AS keep_fraction
       |  FROM documents d JOIN census c ON d.source = c.source
       |  WHERE (CASE $weightCase END) IS NOT NULL)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       |  min(doc_id) AS min_doc_id, max(keep_fraction) AS keep_fraction
       |FROM eligible
       |WHERE ${scoreSql} < keep_fraction
       |GROUP BY source""".stripMargin
  }

  // ---------------------------------------------------------------
  // q95 — split-leakage audit: a ROW-keyed 80/20 split of documents
  // audited against exact-content groups (md5(text) — q10's key).
  // The synthetic corpus has no exact-duplicate texts, so the query
  // PLANTS them deterministically (the q63 boilerplate pattern):
  // every doc_id ≡ 0 or 5 (mod 10) is overwritten with a clone text
  // shared by its pair — 2-member content groups whose members the
  // row-hashed split assigns independently, so a fraction leak
  // across train/test. Both engines replay the identical planting,
  // md5-score split, and md5 grouping; the counts are exact.
  // ---------------------------------------------------------------
  def q95SplitLeakage(spark: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(spark, d).select(
      col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(lit("PLANTED DUPLICATE "),
          floor(col("doc_id") / 10.0).cast("long").cast("string")))
        .otherwise(col("text")).as("text"))
    val assigned = Sampling.deterministicSplit(
      planted, "doc_id", Seq("train" -> 0.8, "test" -> 0.2))
    Sampling.splitLeakage(assigned, md5(col("text")), col("split"))
  }

  val q95Sql: String =
    s"""WITH planted AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 5 = 0
       |      THEN 'PLANTED DUPLICATE ' || CAST(CAST(floor(doc_id / 10.0) AS BIGINT) AS VARCHAR)
       |      ELSE text END AS text
       |  FROM documents),
       |labeled AS (
       |  SELECT md5(text) AS g,
       |    CASE WHEN $scoreSql < 0.8 THEN 'train' ELSE 'test' END AS split
       |  FROM planted),
       |per AS (
       |  SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(count(DISTINCT split) AS BIGINT) AS n_splits
       |  FROM labeled GROUP BY 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_groups,
       |  CAST(sum(CASE WHEN n_rows > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_multi_row_groups,
       |  CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_leaking_groups,
       |  CAST(sum(CASE WHEN n_splits > 1 THEN n_rows ELSE 0 END) AS BIGINT)
       |    AS n_leaking_rows
       |FROM per""".stripMargin

  // ---------------------------------------------------------------
  // q97 — budget-bounded sample: keep documents in md5-score order
  // until ~60k characters — the "give me N tokens, reproducibly"
  // cut. The distributed two-phase prefix sum (bucket totals +
  // boundary-bucket window) replays exactly in DuckDB: same score,
  // same buckets, same keep conditions, exact integer weights.
  // 60k cuts the sf0.01 corpus (149k chars) around 40% — the
  // boundary-bucket path is genuinely exercised at verify scale.
  // ---------------------------------------------------------------
  private val BudgetChars = 60000L
  private val BudgetBuckets = 4096

  def q97BudgetSample(spark: SparkSession, d: String): DataFrame =
    Sampling.sampleToBudget(
        Tables.documents(spark, d), "doc_id", length(col("text")),
        BudgetChars, BudgetBuckets)
      .select(col("doc_id"), length(col("text")).cast("long").as("chars"))

  val q97Sql: String =
    s"""WITH base AS (
       |  SELECT doc_id, COALESCE(CAST(length(text) AS BIGINT), CAST(0 AS BIGINT)) AS w,
       |    $scoreSql AS s
       |  FROM documents),
       |b AS (SELECT *, CAST(floor(s * $BudgetBuckets) AS BIGINT) AS bk FROM base),
       |pb AS (SELECT bk, CAST(sum(w) AS BIGINT) AS wb FROM b GROUP BY 1),
       |cumt AS (SELECT bk, wb,
       |    COALESCE(CAST(sum(wb) OVER (ORDER BY bk
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      CAST(0 AS BIGINT)) AS cumb
       |  FROM pb),
       |j AS (SELECT b.doc_id, b.w, b.s, b.bk, cumt.wb, cumt.cumb
       |  FROM b JOIN cumt ON b.bk = cumt.bk),
       |keep_full AS (
       |  SELECT doc_id, w FROM j WHERE cumb + wb <= $BudgetChars),
       |boundary AS (
       |  SELECT doc_id, w, cumb,
       |    COALESCE(CAST(sum(w) OVER (PARTITION BY bk ORDER BY s, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      CAST(0 AS BIGINT)) AS run
       |  FROM j WHERE cumb < $BudgetChars AND cumb + wb > $BudgetChars),
       |keep_b AS (SELECT doc_id, w FROM boundary WHERE cumb + run < $BudgetChars)
       |SELECT doc_id, w AS chars FROM keep_full
       |UNION ALL SELECT doc_id, w AS chars FROM keep_b""".stripMargin

  // ---------------------------------------------------------------
  // q109 — stride-scheduled mixture interleave: a deterministic
  // curriculum position per document such that any schedule prefix
  // carries the target source proportions (src0 at 4x density, src1
  // at 2x, src5 at half, rest at 1x). The oracle states the naive
  // per-source row_number() form; the engine computes the same rank
  // via cell-partitioned prefix sums (no whole-source window). All
  // weights are exact binary doubles, so positions hash-match.
  // ---------------------------------------------------------------
  private val SchedWeights = Seq("src0" -> 4.0, "src1" -> 2.0, "src5" -> 0.5)

  def q109MixtureSchedule(spark: SparkSession, d: String): DataFrame =
    Sampling.mixtureSchedule(
        Tables.documents(spark, d).select(col("doc_id"), col("source")),
        "doc_id", "source", SchedWeights.toMap, defaultWeight = 1.0)
      .select(col("doc_id"), col("source"), col("source_rank"), col("sched_pos"))

  val q109Sql: String = {
    val weightCase = SchedWeights
      .map { case (s, w) => s"WHEN source = '$s' THEN $w" }
      .mkString(" ")
    s"""WITH scored AS (
       |  SELECT doc_id, source, $scoreSql AS s FROM documents),
       |r AS (SELECT doc_id, source,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY s, doc_id) - 1
       |      AS BIGINT) AS source_rank
       |  FROM scored)
       |SELECT doc_id, source, source_rank,
       |  (CAST(source_rank AS DOUBLE) + 0.5)
       |    / (CASE $weightCase ELSE 1.0 END) AS sched_pos
       |FROM r""".stripMargin
  }

  // ---------------------------------------------------------------
  // q121 — deterministic contrastive negative sampling: 3 uniform
  // non-self negatives per anchor document, resolved through the
  // dense corpus index (cell-partitioned rank machinery — the oracle
  // states the naive global row_number form). Draw j of anchor a is
  // md5_prefix(a:j) mod N: reproducible on any engine, re-drawable
  // per epoch via the salt.
  // ---------------------------------------------------------------
  def q121NegativePairs(spark: SparkSession, d: String): DataFrame =
    Sampling.negativePairs(Tables.documents(spark, d), "doc_id", k = 3)

  // WHERE doc_id IS NOT NULL states the engine's exclusion (index,
  // anchors, AND the modulus all use non-null ids) — on the null-free
  // fixture it is a no-op, but it keeps the two engines' N identical
  // on a corpus with null ids.
  val q121Sql: String =
    """WITH nn AS (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL),
      |ix AS (
      |  SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
      |  FROM nn),
      |a AS (
      |  SELECT doc_id AS anchor_id, CAST(UNNEST(range(0, 3)) AS BIGINT) AS draw
      |  FROM nn),
      |t AS (
      |  SELECT anchor_id, draw,
      |    CAST(CAST(('0x' || substr(md5(CAST(anchor_id AS VARCHAR) || ':' ||
      |      CAST(draw AS VARCHAR)), 1, 15)) AS UBIGINT)
      |      % (SELECT COUNT(*) FROM nn) AS BIGINT) AS tgt
      |  FROM a)
      |SELECT t.anchor_id, t.draw, ix.doc_id AS neg_id
      |FROM t JOIN ix ON ix.idx = t.tgt
      |WHERE ix.doc_id <> t.anchor_id""".stripMargin

  // ---------------------------------------------------------------
  // q138 — near-dup-safe split: documents split train/test by their
  // q54 CLUSTER representative (singletons by their own id), so no
  // near-dup pair can straddle the boundary — the q95 leakage mode
  // prevented by construction rather than audited after the fact.
  // The oracle replays the q54 closure + the identical md5 split
  // predicate over the coalesced key.
  // ---------------------------------------------------------------
  def q138ClusterSafeSplit(spark: SparkSession, d: String): DataFrame = {
    val clusters = ExtensionQueries.q54DupClusters(spark, d)
      .select(col("doc_id"), col("cluster_id"))
    val docs = Tables.documents(spark, d).select("doc_id")
    Sampling.clusterSafeSplit(docs, "doc_id", clusters, "doc_id", "cluster_id",
        Seq("train" -> 0.9, "test" -> 0.1))
      .select(col("doc_id"), col("split"))
  }

  // lazy: ExtensionQueries.q54Sql lives in another object — defer the
  // interpolation past both objects' init
  lazy val q138Sql: String =
    s"""WITH clus AS (${ExtensionQueries.q54Sql}),
       |k AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS key
       |  FROM documents d LEFT JOIN clus c ON d.doc_id = c.doc_id),
       |s AS (SELECT doc_id,
       |    CAST(CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8)) AS UBIGINT)
       |      AS DOUBLE) / 4294967296.0 AS sc
       |  FROM k)
       |SELECT doc_id, CASE WHEN sc < 0.9 THEN 'train' ELSE 'test' END AS split
       |FROM s""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_cluster_safe_split" -> (q138ClusterSafeSplit _),
    "q121_negative_pairs" -> (q121NegativePairs _),
    "q109_mixture_schedule" -> (q109MixtureSchedule _),
    "q97_budget_sample" -> (q97BudgetSample _),
    "q95_split_leakage" -> (q95SplitLeakage _),
    "q26_deterministic_split" -> (q26DeterministicSplit _),
    "q27_stratified_sample"   -> (q27StratifiedSample _),
    "q57_source_cap"          -> (q57SourceCap _),
    "q61_packing"             -> (q61Packing _),
    "q64_quality_cap"         -> (q64QualityCap _),
    "q70_priority_sample"     -> (q70PrioritySample _),
    "q71_source_mixture"      -> (q71SourceMixture _))

  lazy val oracleSql: Map[String, String] = Map(
    "q138_cluster_safe_split" -> q138Sql,
    "q121_negative_pairs" -> q121Sql,
    "q109_mixture_schedule" -> q109Sql,
    "q97_budget_sample" -> q97Sql,
    "q95_split_leakage" -> q95Sql,
    "q26_deterministic_split" -> q26Sql,
    "q27_stratified_sample"   -> q27Sql,
    "q57_source_cap"          -> q57Sql,
    "q61_packing"             -> q61Sql,
    "q64_quality_cap"         -> q64Sql,
    "q70_priority_sample"     -> q70Sql,
    "q71_source_mixture"      -> q71Sql)
}
