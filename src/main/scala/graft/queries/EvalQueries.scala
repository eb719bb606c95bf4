package graft.queries

import graft.AdaptiveCache.CensusPersist
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Evaluation

/** Round-8 evaluation surface: classifier-quality measurement over the
  * scored corpus (exact AUC, calibration) — the eval loop that decides
  * whether a data-quality gate is worth trusting before it filters
  * 100 TB. Score = the q112 linear quality logit; reference label =
  * `lang = 'en'` (the corpus's dominant class), giving both operators a
  * deterministic, engine-portable scored/labeled eval set with no model
  * binary in the loop.
  */
object EvalQueries {

  // shared scored eval set: q112's logit with the label carried
  // through the SAME projection — one scan, no self-join; ONE feature
  // definition for engine and oracle (q112's contract)
  private def scored(spark: SparkSession, d: String): DataFrame =
    graft.operators.TextAnalysis.linearQualityScore(
      Tables.documents(spark, d), "doc_id", "text",
      bias = -2.0, wStopword = 8.0, wPunct = -4.0,
      wMeanWordLen = 0.25, wKChars = 0.5,
      carry = Seq("lang", "source"))
      .select(col("doc_id"), col("logit"), (col("lang") === "en").as("is_en"),
        col("source"))

  // The WHERE states the engine's exclusion contract (aucExact /
  // calibrationReport drop NULL/NaN scores and NULL labels) so both
  // engines share one null semantics even on a corpus WITH nulls —
  // without it the oracle would census NULL logits and count NULL
  // lang as a negative via CASE WHEN.
  private val scoredSql: String =
    s"""WITH q AS (${ExtensionQueries.q112Sql})
       |SELECT q.doc_id, q.logit, d.lang = 'en' AS is_en, d.source
       |FROM q JOIN documents d ON q.doc_id = d.doc_id
       |WHERE q.logit IS NOT NULL AND NOT isnan(q.logit)
       |  AND d.lang IS NOT NULL""".stripMargin

  // ---------------------------------------------------------------
  // q119 — exact ROC AUC (Mann–Whitney with midranks) of the quality
  // logit against the is-English label. Census-then-prefix-sum: no
  // global sort; the oracle states the naive window form over the
  // same distinct-score census, the sums agree exactly, and the one
  // division is stated identically.
  // ---------------------------------------------------------------
  def q119Auc(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.aucExact(s, col("logit"), col("is_en"))
  }

  val q119Sql: String =
    s"""WITH s AS ($scoredSql),
       |c AS (
       |  SELECT logit AS v,
       |    CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS pos,
       |    CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END) AS BIGINT) AS neg
       |  FROM s GROUP BY logit),
       |w AS (
       |  SELECT pos, neg,
       |    COALESCE(CAST(SUM(neg) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cumneg
       |  FROM c)
       |SELECT CAST(SUM(pos) AS BIGINT) AS n_pos, CAST(SUM(neg) AS BIGINT) AS n_neg,
       |  CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
       |  CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0 THEN
       |    CAST(CAST(SUM(pos * (2 * cumneg + neg)) AS DECIMAL(38,0)) AS DOUBLE)
       |      / (2.0 * CAST(CAST(SUM(pos) AS BIGINT) AS DOUBLE)
       |             * CAST(CAST(SUM(neg) AS BIGINT) AS DOUBLE))
       |  END AS auc
       |FROM w""".stripMargin

  // ---------------------------------------------------------------
  // q120 — calibration census of the logit over fixed bands [-4, 4),
  // edge-clamped (the histogramFixed convention): per band, count /
  // positives / empirical positive rate. Empty bands present via the
  // spine so reliability diagrams align across runs.
  // ---------------------------------------------------------------
  def q120Calibration(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.calibrationReport(s, col("logit"), col("is_en"),
      lo = -4.0, hi = 4.0, bins = 16)
  }

  val q120Sql: String =
    s"""WITH s AS ($scoredSql),
       |b AS (
       |  SELECT LEAST(15, GREATEST(0, CAST(FLOOR((logit - (-4.0)) / 0.5) AS BIGINT))) AS band,
       |    CASE WHEN is_en THEN 1 ELSE 0 END AS p
       |  FROM s),
       |c AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS n_pos
       |      FROM b GROUP BY band)
       |SELECT spine.band,
       |  -4.0 + spine.band * 0.5 AS lo,
       |  -4.0 + (spine.band + 1) * 0.5 AS hi,
       |  COALESCE(c.n, 0) AS n, COALESCE(c.n_pos, 0) AS n_pos,
       |  CASE WHEN COALESCE(c.n, 0) > 0
       |    THEN CAST(c.n_pos AS DOUBLE) / CAST(c.n AS DOUBLE) END AS pos_rate
       |FROM (SELECT UNNEST(range(0, 16)) AS band) spine
       |LEFT JOIN c ON spine.band = c.band""".stripMargin

  // ---------------------------------------------------------------
  // q124 — per-SOURCE exact AUC of the quality gate: the question a
  // curation team asks before filtering the mixture ("is the gate
  // equally trustworthy on every source, or does it silently skew
  // one?"). Same census machinery as q119 with the group key carried
  // through; windows partitioned by (source, cell).
  // ---------------------------------------------------------------
  def q124GroupAuc(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.aucExactBy(s, col("source"), col("logit"), col("is_en"))
      .withColumnRenamed("group_key", "source")
  }

  val q124Sql: String =
    s"""WITH s AS ($scoredSql),
       |c AS (
       |  SELECT source, logit AS v,
       |    CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS pos,
       |    CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END) AS BIGINT) AS neg
       |  FROM s WHERE source IS NOT NULL GROUP BY source, logit),
       |w AS (
       |  SELECT source, pos, neg,
       |    COALESCE(CAST(SUM(neg) OVER (PARTITION BY source ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cumneg
       |  FROM c)
       |SELECT source,
       |  CAST(SUM(pos) AS BIGINT) AS n_pos, CAST(SUM(neg) AS BIGINT) AS n_neg,
       |  CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
       |  CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0 THEN
       |    CAST(CAST(SUM(pos * (2 * cumneg + neg)) AS DECIMAL(38,0)) AS DOUBLE)
       |      / (2.0 * CAST(CAST(SUM(pos) AS BIGINT) AS DOUBLE)
       |             * CAST(CAST(SUM(neg) AS BIGINT) AS DOUBLE))
       |  END AS auc
       |FROM w GROUP BY source""".stripMargin

  // ---------------------------------------------------------------
  // q125 — per-SOURCE calibration census over the shared [-4, 4)
  // domain: every source gets all 16 bands (empty bands n=0) so
  // reliability diagrams line up side by side.
  // ---------------------------------------------------------------
  def q125GroupCalibration(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.calibrationReportBy(s, col("source"), col("logit"), col("is_en"),
      lo = -4.0, hi = 4.0, bins = 16)
      .withColumnRenamed("group_key", "source")
  }

  val q125Sql: String =
    s"""WITH s AS ($scoredSql),
       |b AS (
       |  SELECT source,
       |    LEAST(15, GREATEST(0, CAST(FLOOR((logit - (-4.0)) / 0.5) AS BIGINT))) AS band,
       |    CASE WHEN is_en THEN 1 ELSE 0 END AS p
       |  FROM s WHERE source IS NOT NULL),
       |c AS (SELECT source, band, CAST(COUNT(*) AS BIGINT) AS n,
       |        CAST(SUM(p) AS BIGINT) AS n_pos
       |      FROM b GROUP BY source, band),
       |spine AS (SELECT g.source, sp.band
       |  FROM (SELECT DISTINCT source FROM b) g
       |  CROSS JOIN (SELECT UNNEST(range(0, 16)) AS band) sp)
       |SELECT spine.source, spine.band,
       |  -4.0 + spine.band * 0.5 AS lo,
       |  -4.0 + (spine.band + 1) * 0.5 AS hi,
       |  COALESCE(c.n, 0) AS n, COALESCE(c.n_pos, 0) AS n_pos,
       |  CASE WHEN COALESCE(c.n, 0) > 0
       |    THEN CAST(c.n_pos AS DOUBLE) / CAST(c.n AS DOUBLE) END AS pos_rate
       |FROM spine LEFT JOIN c ON spine.source = c.source AND spine.band = c.band""".stripMargin

  // ---------------------------------------------------------------
  // q126 — threshold sweep of the quality gate: per candidate
  // threshold (band edge over the q120 domain), the confusion counts
  // of "keep if logit >= t" plus precision/recall/F1 — the table that
  // picks WHERE to gate before filtering 100 TB. Suffix sums over the
  // 16-row band census; same single scan as q120.
  // ---------------------------------------------------------------
  def q126ThresholdSweep(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.thresholdSweep(s, col("logit"), col("is_en"),
      lo = -4.0, hi = 4.0, bins = 16)
  }

  val q126Sql: String =
    s"""WITH s AS ($scoredSql),
       |b AS (
       |  SELECT LEAST(15, GREATEST(0, CAST(FLOOR((logit - (-4.0)) / 0.5) AS BIGINT))) AS band,
       |    CASE WHEN is_en THEN 1 ELSE 0 END AS p
       |  FROM s),
       |c AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS n_pos
       |      FROM b GROUP BY band),
       |sp AS (SELECT spine.band,
       |    COALESCE(c.n, 0) AS n, COALESCE(c.n_pos, 0) AS n_pos
       |  FROM (SELECT UNNEST(range(0, 16)) AS band) spine
       |  LEFT JOIN c ON spine.band = c.band),
       |w AS (SELECT band, n, n_pos,
       |    CAST(SUM(n_pos) OVER (ORDER BY band
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS tp,
       |    CAST(SUM(n) OVER (ORDER BY band
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS kept,
       |    CAST(SUM(n_pos) OVER () AS BIGINT) AS p_all,
       |    CAST(SUM(n) OVER () AS BIGINT) AS n_all
       |  FROM sp)
       |SELECT band, -4.0 + band * 0.5 AS threshold,
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
  // q127 — per-SOURCE threshold sweep: the q126 table keyed by
  // source, completing the per-source eval triptych (q124 AUC, q125
  // calibration, q127 operating points). One global threshold is
  // rarely right for every source.
  // ---------------------------------------------------------------
  def q127GroupThresholdSweep(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.thresholdSweepBy(s, col("source"), col("logit"), col("is_en"),
      lo = -4.0, hi = 4.0, bins = 16)
      .withColumnRenamed("group_key", "source")
  }

  val q127Sql: String =
    s"""WITH s AS ($scoredSql),
       |b AS (
       |  SELECT source,
       |    LEAST(15, GREATEST(0, CAST(FLOOR((logit - (-4.0)) / 0.5) AS BIGINT))) AS band,
       |    CASE WHEN is_en THEN 1 ELSE 0 END AS p
       |  FROM s WHERE source IS NOT NULL),
       |c AS (SELECT source, band, CAST(COUNT(*) AS BIGINT) AS n,
       |        CAST(SUM(p) AS BIGINT) AS n_pos
       |      FROM b GROUP BY source, band),
       |sp AS (SELECT g.source, spine.band,
       |    COALESCE(c.n, 0) AS n, COALESCE(c.n_pos, 0) AS n_pos
       |  FROM (SELECT DISTINCT source FROM b) g
       |  CROSS JOIN (SELECT UNNEST(range(0, 16)) AS band) spine
       |  LEFT JOIN c ON g.source = c.source AND spine.band = c.band),
       |w AS (SELECT source, band, n, n_pos,
       |    CAST(SUM(n_pos) OVER (PARTITION BY source ORDER BY band
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS tp,
       |    CAST(SUM(n) OVER (PARTITION BY source ORDER BY band
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS kept,
       |    CAST(SUM(n_pos) OVER (PARTITION BY source) AS BIGINT) AS p_all,
       |    CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS n_all
       |  FROM sp)
       |SELECT source, band, -4.0 + band * 0.5 AS threshold,
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
  // q130 — gate APPLY: elect each source's F1-max threshold from the
  // q127 sweep and execute the true gate `logit >= t_source` over the
  // corpus, producing the per-source kept/dropped census — the
  // decision surface a curation run materializes after reading the
  // sweep (q128's analog for thresholds). The sweep is persisted so
  // the elected-point table has known (tiny) statistics and
  // auto-broadcasts into the data-side join.
  // ---------------------------------------------------------------
  def q130GateApply(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    val sweep = Evaluation.thresholdSweepBy(
      s, col("source"), col("logit"), col("is_en"),
      lo = -4.0, hi = 4.0, bins = 16).persistCensus()
    val out = Evaluation.applyOperatingPoints(s, col("source"), col("logit"), sweep)
      .withColumnRenamed("group_key", "source")
    graft.CacheLifecycle.releaseWhenExecuted(out, Seq(sweep))
    out
  }

  // The apply census runs over ALL rows with a non-null source (the
  // gate decides for every row; NULL/NaN logits simply never pass
  // `>= t`), while the operating points come from the sweep with its
  // eval-set exclusions — both engines state the same split.
  val q130Sql: String =
    s"""WITH sw AS ($q127Sql),
       |op0 AS (SELECT source, band, threshold, f1,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY f1 DESC NULLS LAST, band) AS rn
       |  FROM sw),
       |op AS (SELECT source, threshold, f1 FROM op0 WHERE rn = 1),
       |app AS (SELECT q.logit, d.source
       |  FROM (${ExtensionQueries.q112Sql}) q
       |  JOIN documents d ON q.doc_id = d.doc_id
       |  WHERE d.source IS NOT NULL)
       |SELECT app.source, op.threshold, op.f1,
       |  CAST(COUNT(*) AS BIGINT) AS n_total,
       |  CAST(SUM(CASE WHEN app.logit IS NOT NULL AND NOT isnan(app.logit)
       |    AND app.logit >= op.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(COUNT(*) - SUM(CASE WHEN app.logit IS NOT NULL AND NOT isnan(app.logit)
       |    AND app.logit >= op.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  CAST(SUM(CASE WHEN app.logit IS NOT NULL AND NOT isnan(app.logit)
       |    AND app.logit >= op.threshold THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS kept_frac
       |FROM app JOIN op ON app.source = op.source
       |GROUP BY app.source, op.threshold, op.f1""".stripMargin

  // ---------------------------------------------------------------
  // q131 — exact average precision (area under the step-wise PR
  // curve) of the quality logit: the imbalanced-regime companion to
  // q119's ROC AUC. Distinct-score census, DESCENDING prefix sums,
  // per-block precision floor-quantized to 1e-12 by integer division
  // so the numerator is an order-free DECIMAL(38,0) sum — the oracle
  // replays the identical integer arithmetic with HUGEINT `//`.
  // ---------------------------------------------------------------
  def q131Ap(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.averagePrecisionExact(s, col("logit"), col("is_en"))
  }

  val q131Sql: String =
    s"""WITH s AS ($scoredSql),
       |c AS (
       |  SELECT logit AS v,
       |    CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS pos,
       |    CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END) AS BIGINT) AS neg
       |  FROM s GROUP BY logit),
       |w AS (
       |  SELECT pos, neg,
       |    CAST(SUM(pos) OVER (ORDER BY v DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumpos,
       |    CAST(SUM(pos + neg) OVER (ORDER BY v DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumn
       |  FROM c)
       |SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
       |  CAST(SUM(neg) AS BIGINT) AS n_neg,
       |  CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
       |  CASE WHEN SUM(pos) > 0 THEN
       |    CAST(CAST(SUM(pos * ((CAST(cumpos AS HUGEINT) * 1000000000000)
       |        // CAST(cumn AS HUGEINT))) AS DECIMAL(38,0)) AS DOUBLE)
       |      / (1000000000000.0 * CAST(CAST(SUM(pos) AS BIGINT) AS DOUBLE))
       |  END AS ap
       |FROM w""".stripMargin

  // ---------------------------------------------------------------
  // q132 — per-SOURCE exact average precision: the PR side of the
  // per-source triptych (q124 AUC / q125 calibration / q127 sweep).
  // A gate whose ROC AUC holds on every source can still have
  // precision collapse on the source with the lowest base rate —
  // this is the table that shows it.
  // ---------------------------------------------------------------
  def q132GroupAp(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.averagePrecisionBy(s, col("source"), col("logit"), col("is_en"))
      .withColumnRenamed("group_key", "source")
  }

  val q132Sql: String =
    s"""WITH s AS ($scoredSql),
       |c AS (
       |  SELECT source, logit AS v,
       |    CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS pos,
       |    CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END) AS BIGINT) AS neg
       |  FROM s WHERE source IS NOT NULL GROUP BY source, logit),
       |w AS (
       |  SELECT source, pos, neg,
       |    CAST(SUM(pos) OVER (PARTITION BY source ORDER BY v DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumpos,
       |    CAST(SUM(pos + neg) OVER (PARTITION BY source ORDER BY v DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumn
       |  FROM c)
       |SELECT source,
       |  CAST(SUM(pos) AS BIGINT) AS n_pos,
       |  CAST(SUM(neg) AS BIGINT) AS n_neg,
       |  CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
       |  CASE WHEN SUM(pos) > 0 THEN
       |    CAST(CAST(SUM(pos * ((CAST(cumpos AS HUGEINT) * 1000000000000)
       |        // CAST(cumn AS HUGEINT))) AS DECIMAL(38,0)) AS DOUBLE)
       |      / (1000000000000.0 * CAST(CAST(SUM(pos) AS BIGINT) AS DOUBLE))
       |  END AS ap
       |FROM w GROUP BY source""".stripMargin

  // ---------------------------------------------------------------
  // q133 — dedup-WEIGHTED exact AUC: the gate evaluated over the
  // deduplicated corpus (q128's keep-list), each kept cluster
  // representative counting with its cluster size and unclustered
  // docs counting once — so the metric answers for the pre-dedup
  // population while only scoring post-dedup rows. Every weighted
  // mass stays an exact integer; total weighted n equals the full
  // corpus size (each cluster's mass rides its keeper), which is the
  // sanity the oracle pins.
  // ---------------------------------------------------------------
  def q133DedupWeightedAuc(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Both inputs are materialized-table reads (QueryFixtures, r10
    // verdict item 1): in production the scored corpus and the q128
    // keep-list decision table ARE tables a prior pipeline stage
    // wrote — rebuilding them from raw text here made the bench time
    // the LSH fixture, not the weighted metric. The timed region is
    // what q133 exists to pin: the keep-filtered weighted join and
    // the exact integer-mass weighted AUC. The oracle still states
    // the full from-scratch SQL (q112 + q128 verbatim).
    val s = QueryFixtures.ensure(spark, d, "q133_scored", "q133_dedup_weighted_auc")(scored(spark, d))
    val kl = QueryFixtures.ensure(spark, d, "q133_keeplist", "q133_dedup_weighted_auc") {
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("logit").desc, col("doc_id").asc)
      ExtensionQueries.q54DupClusters(spark, d)
        .join(scored(spark, d).select(col("doc_id"), col("logit")), "doc_id")
        .withColumn("keep", row_number().over(w) === 1)
        .select(col("doc_id"), col("cluster_size"), col("keep"))
    }
    val weighted = s.join(kl, Seq("doc_id"), "left")
      .filter(col("keep").isNull || col("keep"))
      .withColumn("w", coalesce(col("cluster_size"), lit(1L)))
    Evaluation.aucExactWeighted(weighted, col("logit"), col("is_en"), col("w"))
  }

  lazy val q133Sql: String =
    s"""WITH s AS ($scoredSql), kl AS (${ExtensionQueries.q128Sql}),
       |j AS (
       |  SELECT s.logit, s.is_en, COALESCE(kl.cluster_size, 1) AS w
       |  FROM s LEFT JOIN kl ON s.doc_id = kl.doc_id
       |  WHERE kl.doc_id IS NULL OR kl.keep),
       |c AS (
       |  SELECT logit AS v,
       |    CAST(SUM(CASE WHEN is_en THEN w ELSE 0 END) AS BIGINT) AS pos,
       |    CAST(SUM(CASE WHEN is_en THEN 0 ELSE w END) AS BIGINT) AS neg
       |  FROM j GROUP BY logit),
       |w2 AS (
       |  SELECT pos, neg,
       |    COALESCE(CAST(SUM(neg) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cumneg
       |  FROM c)
       |SELECT CAST(SUM(pos) AS BIGINT) AS n_pos, CAST(SUM(neg) AS BIGINT) AS n_neg,
       |  CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
       |  CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0 THEN
       |    CAST(CAST(SUM(pos * (2 * cumneg + neg)) AS DECIMAL(38,0)) AS DOUBLE)
       |      / (2.0 * CAST(CAST(SUM(pos) AS BIGINT) AS DOUBLE)
       |             * CAST(CAST(SUM(neg) AS BIGINT) AS DOUBLE))
       |  END AS auc
       |FROM w2""".stripMargin

  // ---------------------------------------------------------------
  // q134 — Poisson-bootstrap AUC confidence spread: 16 deterministic
  // md5-seeded Poisson(1) resamples of the eval set, each replicate's
  // AUC exact via the weighted rank-sum core. The CDF cut points are
  // one shared literal table (Evaluation.PoissonOneCdf) interpolated
  // into BOTH engines, so the draws — and therefore every replicate
  // AUC — hash-match bit for bit.
  // ---------------------------------------------------------------
  private val BootstrapReplicates = 16
  private val BootstrapSalt = "graft-r10"

  def q134AucBootstrap(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.aucBootstrap(s, col("doc_id"), col("logit"), col("is_en"),
      replicates = BootstrapReplicates, salt = BootstrapSalt)
  }

  private val poissonCaseSql: String =
    Evaluation.PoissonOneCdf.zipWithIndex.map { case (c, k) =>
      s"WHEN u < CAST($c AS DOUBLE) THEN $k"
    }.mkString("CASE ", " ", s" ELSE ${Evaluation.PoissonOneCdf.size} END")

  val q134Sql: String =
    s"""WITH s AS ($scoredSql),
       |r AS (SELECT UNNEST(range(0, $BootstrapReplicates)) AS replicate),
       |x AS (
       |  SELECT r.replicate, s.logit, s.is_en,
       |    CAST(CAST(('0x' || substr(md5(
       |      CAST(s.doc_id AS VARCHAR) || '|' || CAST(r.replicate AS VARCHAR)
       |        || '|$BootstrapSalt'), 1, 8)) AS UBIGINT) AS DOUBLE)
       |      / 4294967296.0 AS u
       |  FROM s CROSS JOIN r),
       |wt AS (
       |  SELECT replicate, logit, is_en, $poissonCaseSql AS w FROM x),
       |f AS (SELECT * FROM wt WHERE w > 0),
       |c AS (
       |  SELECT replicate, logit AS v,
       |    CAST(SUM(CASE WHEN is_en THEN w ELSE 0 END) AS BIGINT) AS pos,
       |    CAST(SUM(CASE WHEN is_en THEN 0 ELSE w END) AS BIGINT) AS neg
       |  FROM f GROUP BY replicate, logit),
       |w2 AS (
       |  SELECT replicate, pos, neg,
       |    COALESCE(CAST(SUM(neg) OVER (PARTITION BY replicate ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cumneg
       |  FROM c)
       |SELECT CAST(replicate AS BIGINT) AS replicate,
       |  CAST(SUM(pos) AS BIGINT) AS n_pos, CAST(SUM(neg) AS BIGINT) AS n_neg,
       |  CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
       |  CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0 THEN
       |    CAST(CAST(SUM(pos * (2 * cumneg + neg)) AS DECIMAL(38,0)) AS DOUBLE)
       |      / (2.0 * CAST(CAST(SUM(pos) AS BIGINT) AS DOUBLE)
       |             * CAST(CAST(SUM(neg) AS BIGINT) AS DOUBLE))
       |  END AS auc
       |FROM w2 GROUP BY replicate""".stripMargin

  // ---------------------------------------------------------------
  // q137 — Brier decomposition of the quality gate over the q120
  // bands: reliability (calibration error), resolution (outcome
  // separation), uncertainty (no-skill floor) — the one-row scalar
  // summary of the q120 reliability diagram, with the banded Brier
  // numerator a pure integer sum and the rel/res terms 1e-6-floor-
  // quantized integer divisions the oracle replays with HUGEINT `//`.
  // ---------------------------------------------------------------
  private val BrierBins = 16

  def q137BrierDecomposition(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.brierDecomposition(s, col("logit"), col("is_en"),
      lo = -4.0, hi = 4.0, bins = BrierBins)
  }

  val q137Sql: String = {
    val b4 = 4 * BrierBins       // 64
    val b2 = 2 * BrierBins       // 32
    val bsq = 4 * BrierBins * BrierBins // 1024
    s"""WITH s AS ($scoredSql),
       |b AS (
       |  SELECT LEAST(${BrierBins - 1}, GREATEST(0,
       |      CAST(FLOOR((logit - (-4.0)) / 0.5) AS BIGINT))) AS band,
       |    CASE WHEN is_en THEN 1 ELSE 0 END AS p
       |  FROM s),
       |c AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
       |        CAST(SUM(p) AS BIGINT) AS n_pos
       |      FROM b GROUP BY band),
       |t AS (SELECT
       |    CAST(SUM(n) AS BIGINT) AS n,
       |    CAST(SUM(n_pos) AS BIGINT) AS n_pos,
       |    CAST(SUM((2*band+1)*(2*band+1)*n - $b4*(2*band+1)*n_pos
       |      + $bsq*n_pos) AS DECIMAL(38,0)) AS sb,
       |    CAST(SUM((CAST((2*band+1)*n - $b2*n_pos AS HUGEINT)
       |      * CAST((2*band+1)*n - $b2*n_pos AS HUGEINT)
       |      * 1000000) // CAST($bsq * n AS HUGEINT)) AS DECIMAL(38,0)) AS sr,
       |    CAST(SUM((CAST(n_pos AS HUGEINT) * CAST(n_pos AS HUGEINT)
       |      * 1000000) // CAST(n AS HUGEINT)) AS DECIMAL(38,0)) AS ss,
       |    CAST(SUM(abs((2*band+1)*n - $b2*n_pos)) AS DECIMAL(38,0)) AS se
       |  FROM c)
       |SELECT n, n_pos,
       |  CAST(sb AS DOUBLE) / (${bsq}.0 * CAST(n AS DOUBLE)) AS brier,
       |  CAST(sr AS DOUBLE) / (1000000.0 * CAST(n AS DOUBLE)) AS reliability,
       |  CAST(ss - CAST((CAST(n_pos AS HUGEINT) * CAST(n_pos AS HUGEINT)
       |      * 1000000) // CAST(n AS HUGEINT) AS DECIMAL(38,0)) AS DOUBLE)
       |    / (1000000.0 * CAST(n AS DOUBLE)) AS resolution,
       |  CAST(n_pos AS DOUBLE) * CAST(n - n_pos AS DOUBLE)
       |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS uncertainty,
       |  CAST(se AS DOUBLE) / (${b2}.0 * CAST(n AS DOUBLE)) AS ece
       |FROM t""".stripMargin
  }

  // ---------------------------------------------------------------
  // q140 — per-SOURCE Brier decomposition + ECE over the shared
  // domain: the calibration-scalar leg of the per-source triptych —
  // a gate can hold its global ECE while one source's reliability
  // quietly collapses. Same integer-sum discipline as q137, keyed.
  // ---------------------------------------------------------------
  def q140GroupBrier(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.brierDecompositionBy(s, col("source"), col("logit"), col("is_en"),
      lo = -4.0, hi = 4.0, bins = BrierBins)
      .withColumnRenamed("group_key", "source")
  }

  val q140Sql: String = {
    val b4 = 4 * BrierBins
    val b2 = 2 * BrierBins
    val bsq = 4 * BrierBins * BrierBins
    s"""WITH s AS ($scoredSql),
       |b AS (
       |  SELECT source, LEAST(${BrierBins - 1}, GREATEST(0,
       |      CAST(FLOOR((logit - (-4.0)) / 0.5) AS BIGINT))) AS band,
       |    CASE WHEN is_en THEN 1 ELSE 0 END AS p
       |  FROM s WHERE source IS NOT NULL),
       |c AS (SELECT source, band, CAST(COUNT(*) AS BIGINT) AS n,
       |        CAST(SUM(p) AS BIGINT) AS n_pos
       |      FROM b GROUP BY source, band),
       |t AS (SELECT source,
       |    CAST(SUM(n) AS BIGINT) AS n,
       |    CAST(SUM(n_pos) AS BIGINT) AS n_pos,
       |    CAST(SUM((2*band+1)*(2*band+1)*n - $b4*(2*band+1)*n_pos
       |      + $bsq*n_pos) AS DECIMAL(38,0)) AS sb,
       |    CAST(SUM((CAST((2*band+1)*n - $b2*n_pos AS HUGEINT)
       |      * CAST((2*band+1)*n - $b2*n_pos AS HUGEINT)
       |      * 1000000) // CAST($bsq * n AS HUGEINT)) AS DECIMAL(38,0)) AS sr,
       |    CAST(SUM((CAST(n_pos AS HUGEINT) * CAST(n_pos AS HUGEINT)
       |      * 1000000) // CAST(n AS HUGEINT)) AS DECIMAL(38,0)) AS ss,
       |    CAST(SUM(abs((2*band+1)*n - $b2*n_pos)) AS DECIMAL(38,0)) AS se
       |  FROM c GROUP BY source)
       |SELECT source, n, n_pos,
       |  CAST(sb AS DOUBLE) / (${bsq}.0 * CAST(n AS DOUBLE)) AS brier,
       |  CAST(sr AS DOUBLE) / (1000000.0 * CAST(n AS DOUBLE)) AS reliability,
       |  CAST(ss - CAST((CAST(n_pos AS HUGEINT) * CAST(n_pos AS HUGEINT)
       |      * 1000000) // CAST(n AS HUGEINT) AS DECIMAL(38,0)) AS DOUBLE)
       |    / (1000000.0 * CAST(n AS DOUBLE)) AS resolution,
       |  CAST(n_pos AS DOUBLE) * CAST(n - n_pos AS DOUBLE)
       |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS uncertainty,
       |  CAST(se AS DOUBLE) / (${b2}.0 * CAST(n AS DOUBLE)) AS ece
       |FROM t""".stripMargin
  }

  // ---------------------------------------------------------------
  // q139 — Spearman rank correlation between the quality logit and
  // document length: "is the gate just a proxy for length?" as an
  // exact number. Doubled midranks keep every centered sum an exact
  // integer; the oracle replays the identical rank census with naive
  // windows and states the same three-float final expression.
  // ---------------------------------------------------------------
  def q139LengthCorrelation(spark: SparkSession, d: String): DataFrame = {
    // the table's n_chars rides under an alias: qualityFeatures emits
    // its own computed n_chars feature, and a same-name carry would
    // be ambiguous
    val docs = Tables.documents(spark, d).withColumn("doc_len", col("n_chars"))
    val s = graft.operators.TextAnalysis.linearQualityScore(
      docs, "doc_id", "text",
      bias = -2.0, wStopword = 8.0, wPunct = -4.0,
      wMeanWordLen = 0.25, wKChars = 0.5,
      carry = Seq("doc_len"))
    graft.operators.Profiling.spearmanCorr(s, col("logit"), col("doc_len"))
  }

  val q139Sql: String =
    s"""WITH q AS (${ExtensionQueries.q112Sql}),
       |s AS (SELECT q.logit AS x, CAST(d.n_chars AS DOUBLE) AS y
       |  FROM q JOIN documents d ON q.doc_id = d.doc_id
       |  WHERE q.logit IS NOT NULL AND NOT isnan(q.logit)
       |    AND d.n_chars IS NOT NULL),
       |xc AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY x),
       |xr AS (SELECT v,
       |    2 * COALESCE(CAST(SUM(cnt) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      + cnt + 1 AS mr2
       |  FROM xc),
       |yc AS (SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY y),
       |yr AS (SELECT v,
       |    2 * COALESCE(CAST(SUM(cnt) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      + cnt + 1 AS mr2
       |  FROM yc),
       |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
       |d2 AS (SELECT CAST(xr.mr2 - (t.n + 1) AS HUGEINT) AS da,
       |    CAST(yr.mr2 - (t.n + 1) AS HUGEINT) AS db
       |  FROM s JOIN xr ON s.x = xr.v JOIN yr ON s.y = yr.v CROSS JOIN t),
       |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(da * db) AS sab, SUM(da * da) AS saa, SUM(db * db) AS sbb
       |  FROM d2)
       |SELECT n,
       |  CASE WHEN saa > 0 AND sbb > 0 THEN
       |    CAST(sab AS DOUBLE) / sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE))
       |  END AS spearman_rho
       |FROM a""".stripMargin

  // ---------------------------------------------------------------
  // q142 — isotonic (PAV) recalibration mapping of the quality gate
  // over the q120 bands: the FIX completing the calibration family.
  // The engine pools adjacent violators driver-side over the ≤ bins
  // census (exact long cross-product comparisons); the oracle states
  // the MINIMAX characterization of the same fit — calibrated_p(b) =
  // max_{i<=b} min_{j>=b} pooled-rate[i..j] over non-empty bands —
  // an O(bins³) SQL the two routes provably share (each candidate
  // rate is a single division of exact longs, so equal rationals are
  // equal doubles). Oracle-pinned on the NON-EMPTY bands (the
  // engine's empty-band block-extension is a stated convention,
  // spec-pinned).
  // ---------------------------------------------------------------
  def q142IsotonicCalibration(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.isotonicCalibration(s, col("logit"), col("is_en"),
      lo = -4.0, hi = 4.0, bins = BrierBins)
      .filter(col("n") > 0L)
  }

  val q142Sql: String =
    s"""WITH s AS ($scoredSql),
       |b AS (
       |  SELECT LEAST(${BrierBins - 1}, GREATEST(0,
       |      CAST(FLOOR((logit - (-4.0)) / 0.5) AS BIGINT))) AS band,
       |    CASE WHEN is_en THEN 1 ELSE 0 END AS p
       |  FROM s),
       |c AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
       |        CAST(SUM(p) AS BIGINT) AS n_pos
       |      FROM b GROUP BY band),
       |ranges AS (SELECT i.band AS lo_b, j.band AS hi_b,
       |    CAST(CAST(SUM(k.n_pos) AS BIGINT) AS DOUBLE)
       |      / CAST(CAST(SUM(k.n) AS BIGINT) AS DOUBLE) AS r
       |  FROM c i JOIN c j ON i.band <= j.band
       |  JOIN c k ON k.band BETWEEN i.band AND j.band
       |  GROUP BY i.band, j.band),
       |mn AS (SELECT cb.band, rg.lo_b, MIN(rg.r) AS v
       |  FROM c cb JOIN ranges rg ON rg.lo_b <= cb.band AND rg.hi_b >= cb.band
       |  GROUP BY cb.band, rg.lo_b),
       |mm AS (SELECT band, MAX(v) AS calibrated_p FROM mn GROUP BY band)
       |SELECT c.band, -4.0 + c.band * 0.5 AS lo, -4.0 + (c.band + 1) * 0.5 AS hi,
       |  c.n, c.n_pos, mm.calibrated_p
       |FROM c JOIN mm ON c.band = mm.band""".stripMargin

  // ---------------------------------------------------------------
  // q143 — per-SOURCE isotonic recalibration: each source gets its
  // own PAV mapping over the shared domain (the q142 fit keyed by
  // source). Oracle: the minimax characterization partitioned by
  // source. Non-empty bands pinned, as in q142.
  // ---------------------------------------------------------------
  def q143GroupIsotonic(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.isotonicCalibrationBy(s, col("source"), col("logit"), col("is_en"),
      lo = -4.0, hi = 4.0, bins = BrierBins)
      .withColumnRenamed("group_key", "source")
      .filter(col("n") > 0L)
  }

  val q143Sql: String =
    s"""WITH s AS ($scoredSql),
       |b AS (
       |  SELECT source, LEAST(${BrierBins - 1}, GREATEST(0,
       |      CAST(FLOOR((logit - (-4.0)) / 0.5) AS BIGINT))) AS band,
       |    CASE WHEN is_en THEN 1 ELSE 0 END AS p
       |  FROM s WHERE source IS NOT NULL),
       |c AS (SELECT source, band, CAST(COUNT(*) AS BIGINT) AS n,
       |        CAST(SUM(p) AS BIGINT) AS n_pos
       |      FROM b GROUP BY source, band),
       |ranges AS (SELECT i.source, i.band AS lo_b, j.band AS hi_b,
       |    CAST(CAST(SUM(k.n_pos) AS BIGINT) AS DOUBLE)
       |      / CAST(CAST(SUM(k.n) AS BIGINT) AS DOUBLE) AS r
       |  FROM c i JOIN c j ON i.source = j.source AND i.band <= j.band
       |  JOIN c k ON k.source = i.source AND k.band BETWEEN i.band AND j.band
       |  GROUP BY i.source, i.band, j.band),
       |mn AS (SELECT cb.source, cb.band, rg.lo_b, MIN(rg.r) AS v
       |  FROM c cb JOIN ranges rg ON rg.source = cb.source
       |    AND rg.lo_b <= cb.band AND rg.hi_b >= cb.band
       |  GROUP BY cb.source, cb.band, rg.lo_b),
       |mm AS (SELECT source, band, MAX(v) AS calibrated_p
       |  FROM mn GROUP BY source, band)
       |SELECT c.source, c.band,
       |  -4.0 + c.band * 0.5 AS lo, -4.0 + (c.band + 1) * 0.5 AS hi,
       |  c.n, c.n_pos, mm.calibrated_p
       |FROM c JOIN mm ON c.source = mm.source AND c.band = mm.band""".stripMargin

  // ---------------------------------------------------------------
  // q144 — exact two-sample Kolmogorov–Smirnov statistic of the
  // quality logit between the English and non-English cohorts: the
  // sup-CDF-gap complement to q119's AUC (AUC integrates the
  // separation; D localizes it — ks_at says WHERE the distributions
  // diverge most, i.e. where a gate threshold discriminates hardest).
  // Census + cell-partitioned inclusive prefix: no global sort; the
  // oracle states the naive window form over the same distinct-value
  // census and every division/subtraction identically.
  // ---------------------------------------------------------------
  def q144Ks(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    graft.operators.StatTests.ksTwoSample(s, col("logit"), col("is_en"))
  }

  val q144Sql: String =
    s"""WITH s AS ($scoredSql),
       |c AS (
       |  SELECT logit AS v,
       |    CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |    CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END) AS BIGINT) AS nb
       |  FROM s GROUP BY logit),
       |t AS (SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb,
       |        CAST(COUNT(*) AS BIGINT) AS nd FROM c),
       |w AS (
       |  SELECT v,
       |    CAST(SUM(na) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
       |    CAST(SUM(nb) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
       |  FROM c),
       |g AS (
       |  SELECT w.v,
       |    ABS(CAST(w.ca AS DOUBLE) / CAST(t.ta AS DOUBLE)
       |      - CAST(w.cb AS DOUBLE) / CAST(t.tb AS DOUBLE)) AS gap
       |  FROM w CROSS JOIN t),
       |m AS (SELECT MAX(gap) AS mx FROM g)
       |SELECT t.ta AS n_a, t.tb AS n_b, t.nd AS n_distinct_values,
       |  CASE WHEN t.ta > 0 AND t.tb > 0 THEN m.mx END AS ks_stat,
       |  CASE WHEN t.ta > 0 AND t.tb > 0 THEN
       |    (SELECT MIN(v) FROM g WHERE gap = m.mx) END AS ks_at,
       |  CASE WHEN t.ta > 0 AND t.tb > 0 THEN
       |    SQRT(CAST(t.ta AS DOUBLE) * CAST(t.tb AS DOUBLE)
       |      / CAST(t.ta + t.tb AS DOUBLE)) * m.mx END AS ks_z
       |FROM t CROSS JOIN m""".stripMargin

  // ---------------------------------------------------------------
  // q146 — Mann–Whitney rank-sum z with tie correction: q119's AUC
  // machinery finished as a significance statistic ("is the gate's
  // separation more than chance at these sample sizes"). Identical
  // DECIMAL(38,0) rank-sum numerator; the tie term accumulates in
  // HUGEINT/DECIMAL(38,0); the z formula is one fixed IEEE dag stated
  // identically in both engines.
  // ---------------------------------------------------------------
  def q146RankSum(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.rankSumTest(s, col("logit"), col("is_en"))
  }

  val q146Sql: String =
    s"""WITH s AS ($scoredSql),
       |c AS (
       |  SELECT logit AS v,
       |    CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS pos,
       |    CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END) AS BIGINT) AS neg
       |  FROM s GROUP BY logit),
       |w AS (
       |  SELECT pos, neg,
       |    COALESCE(CAST(SUM(neg) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cumneg
       |  FROM c),
       |a AS (
       |  SELECT CAST(SUM(pos) AS BIGINT) AS n_pos, CAST(SUM(neg) AS BIGINT) AS n_neg,
       |    CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
       |    CAST(SUM(pos * (2 * cumneg + neg)) AS DECIMAL(38,0)) AS num,
       |    CAST(SUM(CAST(pos + neg AS HUGEINT) * (pos + neg) * (pos + neg)
       |      - (pos + neg)) AS DECIMAL(38,0)) AS tie
       |  FROM w)
       |SELECT n_pos, n_neg, n_distinct_scores,
       |  CAST(num AS DOUBLE) / 2.0 AS u,
       |  CAST(tie AS DOUBLE) AS tie_term,
       |  CASE WHEN n_pos > 0 AND n_neg > 0
       |    AND CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE) / 12.0
       |      * ((CAST(n_pos + n_neg AS DOUBLE) + 1.0)
       |         - CAST(tie AS DOUBLE) / (CAST(n_pos + n_neg AS DOUBLE)
       |             * (CAST(n_pos + n_neg AS DOUBLE) - 1.0))) > 0.0
       |  THEN (CAST(num AS DOUBLE) - CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
       |    / (2.0 * SQRT(CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE) / 12.0
       |      * ((CAST(n_pos + n_neg AS DOUBLE) + 1.0)
       |         - CAST(tie AS DOUBLE) / (CAST(n_pos + n_neg AS DOUBLE)
       |             * (CAST(n_pos + n_neg AS DOUBLE) - 1.0)))))
       |  END AS z,
       |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
       |    CAST(num AS DOUBLE) / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) - 1.0
       |  END AS cliffs_delta
       |FROM a""".stripMargin

  // ---------------------------------------------------------------
  // q147 — per-source KS drift vs rest-of-corpus: for every source,
  // the exact two-sample KS statistic between its quality-logit
  // distribution and everything else — "which source's score
  // distribution diverges most?", the distribution-level leg of the
  // per-source drift triptych (q124 AUC / q125 calibration / q140
  // Brier). One (source, logit) census; the global cumulative is
  // computed once and shared through the groups × distinct-values
  // spine; per-source prefixes are (source, cell)-partitioned.
  // ---------------------------------------------------------------
  def q147GroupKs(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    graft.operators.StatTests.ksGroupVsRest(s, col("source"), col("logit"))
      .withColumnRenamed("group_key", "source")
  }

  val q147Sql: String =
    s"""WITH s AS ($scoredSql),
       |gv AS (
       |  SELECT source AS g, logit AS v, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM s WHERE source IS NOT NULL GROUP BY source, logit),
       |av AS (SELECT v, CAST(SUM(n) AS BIGINT) AS n_all FROM gv GROUP BY v),
       |ac AS (
       |  SELECT v, CAST(SUM(n_all) OVER (ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_all
       |  FROM av),
       |tg AS (SELECT g, CAST(SUM(n) AS BIGINT) AS t FROM gv GROUP BY g),
       |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
       |        (SELECT CAST(COUNT(*) AS BIGINT) FROM av) AS nd FROM gv),
       |sp AS (SELECT tg.g, ac.v, ac.cum_all FROM tg CROSS JOIN ac),
       |cg AS (
       |  SELECT sp.g, sp.v, sp.cum_all,
       |    CAST(SUM(COALESCE(gv.n, 0)) OVER (PARTITION BY sp.g ORDER BY sp.v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_g
       |  FROM sp LEFT JOIN gv ON gv.g = sp.g AND gv.v = sp.v),
       |gaps AS (
       |  SELECT cg.g, cg.v,
       |    ABS(CAST(cg.cum_g AS DOUBLE) / CAST(tg.t AS DOUBLE)
       |      - CAST(cg.cum_all - cg.cum_g AS DOUBLE)
       |        / CAST(tot.nn - tg.t AS DOUBLE)) AS gap
       |  FROM cg JOIN tg ON cg.g = tg.g CROSS JOIN tot),
       |m AS (SELECT g, MAX(gap) AS mx FROM gaps GROUP BY g)
       |SELECT tg.g AS source, tg.t AS n_group, tot.nn - tg.t AS n_rest,
       |  tot.nd AS n_distinct_values,
       |  CASE WHEN tg.t < tot.nn THEN m.mx END AS ks_stat,
       |  CASE WHEN tg.t < tot.nn THEN
       |    (SELECT MIN(v) FROM gaps WHERE gaps.g = m.g AND gaps.gap = m.mx)
       |  END AS ks_at,
       |  CASE WHEN tg.t < tot.nn THEN
       |    SQRT(CAST(tg.t AS DOUBLE) * CAST(tot.nn - tg.t AS DOUBLE)
       |      / CAST(tot.nn AS DOUBLE)) * m.mx END AS ks_z
       |FROM m JOIN tg ON m.g = tg.g CROSS JOIN tot""".stripMargin

  // ---------------------------------------------------------------
  // q148 — per-source Mann–Whitney rank-sum z: q146's significance
  // statistic keyed by source ("source X's AUC of 0.7 — is that
  // signal or sample size?"). Shares the grouped census machinery
  // with q124; oracle = the q146 formula partitioned by source.
  // ---------------------------------------------------------------
  def q148GroupRankSum(spark: SparkSession, d: String): DataFrame = {
    val s = scored(spark, d)
    Evaluation.rankSumTestBy(s, col("source"), col("logit"), col("is_en"))
      .withColumnRenamed("group_key", "source")
  }

  val q148Sql: String =
    s"""WITH s AS ($scoredSql),
       |c AS (
       |  SELECT source, logit AS v,
       |    CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS pos,
       |    CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END) AS BIGINT) AS neg
       |  FROM s WHERE source IS NOT NULL GROUP BY source, logit),
       |w AS (
       |  SELECT source, pos, neg,
       |    COALESCE(CAST(SUM(neg) OVER (PARTITION BY source ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cumneg
       |  FROM c),
       |a AS (
       |  SELECT source,
       |    CAST(SUM(pos) AS BIGINT) AS n_pos, CAST(SUM(neg) AS BIGINT) AS n_neg,
       |    CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
       |    CAST(SUM(pos * (2 * cumneg + neg)) AS DECIMAL(38,0)) AS num,
       |    CAST(SUM(CAST(pos + neg AS HUGEINT) * (pos + neg) * (pos + neg)
       |      - (pos + neg)) AS DECIMAL(38,0)) AS tie
       |  FROM w GROUP BY source)
       |SELECT source, n_pos, n_neg, n_distinct_scores,
       |  CAST(num AS DOUBLE) / 2.0 AS u,
       |  CAST(tie AS DOUBLE) AS tie_term,
       |  CASE WHEN n_pos > 0 AND n_neg > 0
       |    AND CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE) / 12.0
       |      * ((CAST(n_pos + n_neg AS DOUBLE) + 1.0)
       |         - CAST(tie AS DOUBLE) / (CAST(n_pos + n_neg AS DOUBLE)
       |             * (CAST(n_pos + n_neg AS DOUBLE) - 1.0))) > 0.0
       |  THEN (CAST(num AS DOUBLE) - CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
       |    / (2.0 * SQRT(CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE) / 12.0
       |      * ((CAST(n_pos + n_neg AS DOUBLE) + 1.0)
       |         - CAST(tie AS DOUBLE) / (CAST(n_pos + n_neg AS DOUBLE)
       |             * (CAST(n_pos + n_neg AS DOUBLE) - 1.0)))))
       |  END AS z,
       |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
       |    CAST(num AS DOUBLE) / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) - 1.0
       |  END AS cliffs_delta
       |FROM a""".stripMargin

  // ---------------------------------------------------------------
  // q151 — banded Kendall τ-b of the quality logit vs document
  // length: q139's Spearman companion with the concordance-based tie
  // treatment. Banding makes the 2-D dominance counts suffix sums
  // over the 16×16 census grid (exact Kendall would need an
  // order-statistic structure no shuffle expresses); bands use the
  // calibration clamp on [-4,4) × [0,640).
  // ---------------------------------------------------------------
  def q151KendallTau(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d).withColumn("doc_len", col("n_chars"))
    val s = graft.operators.TextAnalysis.linearQualityScore(
      docs, "doc_id", "text",
      bias = -2.0, wStopword = 8.0, wPunct = -4.0,
      wMeanWordLen = 0.25, wKChars = 0.5,
      carry = Seq("doc_len"))
    graft.operators.Profiling.kendallTauBanded(s,
      col("logit"), col("doc_len"),
      loX = -4.0, hiX = 4.0, binsX = 16,
      loY = 0.0, hiY = 640.0, binsY = 16)
  }

  val q151Sql: String =
    s"""WITH q AS (${ExtensionQueries.q112Sql}),
       |s AS (SELECT q.logit AS x, CAST(d.n_chars AS DOUBLE) AS y
       |  FROM q JOIN documents d ON q.doc_id = d.doc_id
       |  WHERE q.logit IS NOT NULL AND NOT isnan(q.logit)
       |    AND d.n_chars IS NOT NULL),
       |bnd AS (SELECT
       |    LEAST(15, GREATEST(0, CAST(FLOOR((x - (-4.0)) / 0.5) AS BIGINT))) AS bx,
       |    LEAST(15, GREATEST(0, CAST(FLOOR((y - 0.0) / 40.0) AS BIGINT))) AS byy
       |  FROM s),
       |c AS (SELECT bx, byy, CAST(COUNT(*) AS BIGINT) AS n FROM bnd GROUP BY bx, byy),
       |grid AS (SELECT gx.bx, gy.byy
       |  FROM (SELECT UNNEST(range(0, 16)) AS bx) gx
       |  CROSS JOIN (SELECT UNNEST(range(0, 16)) AS byy) gy),
       |f AS (SELECT grid.bx, grid.byy, COALESCE(c.n, 0) AS n
       |  FROM grid LEFT JOIN c ON grid.bx = c.bx AND grid.byy = c.byy),
       |s1 AS (SELECT bx, byy, n,
       |    COALESCE(CAST(SUM(n) OVER (PARTITION BY bx ORDER BY byy
       |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS BIGINT), 0) AS sab,
       |    COALESCE(CAST(SUM(n) OVER (PARTITION BY bx ORDER BY byy
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS sbe
       |  FROM f),
       |dom AS (SELECT bx, byy, n,
       |    COALESCE(CAST(SUM(sab) OVER (PARTITION BY byy ORDER BY bx
       |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS BIGINT), 0) AS gg,
       |    COALESCE(CAST(SUM(sbe) OVER (PARTITION BY byy ORDER BY bx
       |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS BIGINT), 0) AS ll
       |  FROM s1),
       |a AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
       |    CAST(SUM(CAST(n AS HUGEINT) * gg) AS DECIMAL(38,0)) AS c,
       |    CAST(SUM(CAST(n AS HUGEINT) * ll) AS DECIMAL(38,0)) AS d,
       |    CAST(SUM(CAST(n AS HUGEINT) * (n - 1)) AS DECIMAL(38,0)) AS txy
       |  FROM dom),
       |tx AS (SELECT CAST(SUM(CAST(t AS HUGEINT) * (t - 1)) AS DECIMAL(38,0)) AS v
       |  FROM (SELECT CAST(SUM(n) AS BIGINT) AS t FROM f GROUP BY bx) mt),
       |ty AS (SELECT CAST(SUM(CAST(t AS HUGEINT) * (t - 1)) AS DECIMAL(38,0)) AS v
       |  FROM (SELECT CAST(SUM(n) AS BIGINT) AS t FROM f GROUP BY byy) mt)
       |SELECT a.n,
       |  CAST(a.c AS DOUBLE) AS concordant, CAST(a.d AS DOUBLE) AS discordant,
       |  CAST(tx.v AS DOUBLE) AS tie_x2, CAST(ty.v AS DOUBLE) AS tie_y2,
       |  CAST(a.txy AS DOUBLE) AS tie_xy2,
       |  CASE WHEN (CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1.0)
       |        - CAST(tx.v AS DOUBLE)) / 2.0 > 0.0
       |    AND (CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1.0)
       |        - CAST(ty.v AS DOUBLE)) / 2.0 > 0.0
       |  THEN (CAST(a.c AS DOUBLE) - CAST(a.d AS DOUBLE))
       |    / SQRT(((CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1.0)
       |        - CAST(tx.v AS DOUBLE)) / 2.0)
       |      * ((CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1.0)
       |        - CAST(ty.v AS DOUBLE)) / 2.0))
       |  END AS tau_b
       |FROM a CROSS JOIN tx CROSS JOIN ty""".stripMargin

  // ---------------------------------------------------------------
  // q152 — per-source Spearman ρ of the quality logit vs document
  // length: q139 keyed by source — "is the gate a length proxy on
  // SOME source?". Ranks are per-source doubled midranks over the
  // shared census machinery; the oracle partitions the q139 window
  // replay by source.
  // ---------------------------------------------------------------
  def q152GroupSpearman(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d).withColumn("doc_len", col("n_chars"))
    val s = graft.operators.TextAnalysis.linearQualityScore(
      docs, "doc_id", "text",
      bias = -2.0, wStopword = 8.0, wPunct = -4.0,
      wMeanWordLen = 0.25, wKChars = 0.5,
      carry = Seq("doc_len", "source"))
    graft.operators.Profiling.spearmanCorrBy(
        s, col("source"), col("logit"), col("doc_len"))
      .withColumnRenamed("group_key", "source")
  }

  val q152Sql: String =
    s"""WITH q AS (${ExtensionQueries.q112Sql}),
       |s AS (SELECT d.source AS g, q.logit AS x, CAST(d.n_chars AS DOUBLE) AS y
       |  FROM q JOIN documents d ON q.doc_id = d.doc_id
       |  WHERE q.logit IS NOT NULL AND NOT isnan(q.logit)
       |    AND d.n_chars IS NOT NULL AND d.source IS NOT NULL),
       |xc AS (SELECT g, x AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY g, x),
       |xr AS (SELECT g, v,
       |    2 * COALESCE(CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      + cnt + 1 AS mr2
       |  FROM xc),
       |yc AS (SELECT g, y AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY g, y),
       |yr AS (SELECT g, v,
       |    2 * COALESCE(CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      + cnt + 1 AS mr2
       |  FROM yc),
       |t AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY g),
       |d2 AS (SELECT s.g, CAST(xr.mr2 - (t.n + 1) AS HUGEINT) AS da,
       |    CAST(yr.mr2 - (t.n + 1) AS HUGEINT) AS db
       |  FROM s JOIN xr ON s.g = xr.g AND s.x = xr.v
       |  JOIN yr ON s.g = yr.g AND s.y = yr.v
       |  JOIN t ON s.g = t.g),
       |a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(da * db) AS sab, SUM(da * da) AS saa, SUM(db * db) AS sbb
       |  FROM d2 GROUP BY g)
       |SELECT g AS source, n,
       |  CASE WHEN saa > 0 AND sbb > 0 THEN
       |    CAST(sab AS DOUBLE) / sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE))
       |  END AS spearman_rho
       |FROM a""".stripMargin

  // ---------------------------------------------------------------
  // q156 — per-source banded Kendall τ-b: q151 keyed by source,
  // completing the correlation family's grouped forms (q152 is the
  // per-source Spearman). Oracle = the q151 grid replay partitioned
  // by source.
  // ---------------------------------------------------------------
  def q156GroupKendall(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d).withColumn("doc_len", col("n_chars"))
    val s = graft.operators.TextAnalysis.linearQualityScore(
      docs, "doc_id", "text",
      bias = -2.0, wStopword = 8.0, wPunct = -4.0,
      wMeanWordLen = 0.25, wKChars = 0.5,
      carry = Seq("doc_len", "source"))
    graft.operators.Profiling.kendallTauBandedBy(s,
      col("source"), col("logit"), col("doc_len"),
      loX = -4.0, hiX = 4.0, binsX = 16,
      loY = 0.0, hiY = 640.0, binsY = 16)
      .withColumnRenamed("group_key", "source")
  }

  val q156Sql: String =
    s"""WITH q AS (${ExtensionQueries.q112Sql}),
       |s AS (SELECT d.source AS g, q.logit AS x, CAST(d.n_chars AS DOUBLE) AS y
       |  FROM q JOIN documents d ON q.doc_id = d.doc_id
       |  WHERE q.logit IS NOT NULL AND NOT isnan(q.logit)
       |    AND d.n_chars IS NOT NULL AND d.source IS NOT NULL),
       |bnd AS (SELECT g,
       |    LEAST(15, GREATEST(0, CAST(FLOOR((x - (-4.0)) / 0.5) AS BIGINT))) AS bx,
       |    LEAST(15, GREATEST(0, CAST(FLOOR((y - 0.0) / 40.0) AS BIGINT))) AS byy
       |  FROM s),
       |c AS (SELECT g, bx, byy, CAST(COUNT(*) AS BIGINT) AS n
       |      FROM bnd GROUP BY g, bx, byy),
       |grid AS (SELECT gs.g, gx.bx, gy.byy
       |  FROM (SELECT DISTINCT g FROM c) gs
       |  CROSS JOIN (SELECT UNNEST(range(0, 16)) AS bx) gx
       |  CROSS JOIN (SELECT UNNEST(range(0, 16)) AS byy) gy),
       |f AS (SELECT grid.g, grid.bx, grid.byy, COALESCE(c.n, 0) AS n
       |  FROM grid LEFT JOIN c
       |    ON grid.g = c.g AND grid.bx = c.bx AND grid.byy = c.byy),
       |s1 AS (SELECT g, bx, byy, n,
       |    COALESCE(CAST(SUM(n) OVER (PARTITION BY g, bx ORDER BY byy
       |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS BIGINT), 0) AS sab,
       |    COALESCE(CAST(SUM(n) OVER (PARTITION BY g, bx ORDER BY byy
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS sbe
       |  FROM f),
       |dom AS (SELECT g, bx, byy, n,
       |    COALESCE(CAST(SUM(sab) OVER (PARTITION BY g, byy ORDER BY bx
       |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS BIGINT), 0) AS gg,
       |    COALESCE(CAST(SUM(sbe) OVER (PARTITION BY g, byy ORDER BY bx
       |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS BIGINT), 0) AS ll
       |  FROM s1),
       |a AS (SELECT g, CAST(SUM(n) AS BIGINT) AS n,
       |    CAST(SUM(CAST(n AS HUGEINT) * gg) AS DECIMAL(38,0)) AS c,
       |    CAST(SUM(CAST(n AS HUGEINT) * ll) AS DECIMAL(38,0)) AS d,
       |    CAST(SUM(CAST(n AS HUGEINT) * (n - 1)) AS DECIMAL(38,0)) AS txy
       |  FROM dom GROUP BY g),
       |tx AS (SELECT g, CAST(SUM(CAST(t AS HUGEINT) * (t - 1)) AS DECIMAL(38,0)) AS v
       |  FROM (SELECT g, CAST(SUM(n) AS BIGINT) AS t FROM f GROUP BY g, bx) mt
       |  GROUP BY g),
       |ty AS (SELECT g, CAST(SUM(CAST(t AS HUGEINT) * (t - 1)) AS DECIMAL(38,0)) AS v
       |  FROM (SELECT g, CAST(SUM(n) AS BIGINT) AS t FROM f GROUP BY g, byy) mt
       |  GROUP BY g)
       |SELECT a.g AS source, a.n,
       |  CAST(a.c AS DOUBLE) AS concordant, CAST(a.d AS DOUBLE) AS discordant,
       |  CAST(tx.v AS DOUBLE) AS tie_x2, CAST(ty.v AS DOUBLE) AS tie_y2,
       |  CAST(a.txy AS DOUBLE) AS tie_xy2,
       |  CASE WHEN (CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1.0)
       |        - CAST(tx.v AS DOUBLE)) / 2.0 > 0.0
       |    AND (CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1.0)
       |        - CAST(ty.v AS DOUBLE)) / 2.0 > 0.0
       |  THEN (CAST(a.c AS DOUBLE) - CAST(a.d AS DOUBLE))
       |    / SQRT(((CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1.0)
       |        - CAST(tx.v AS DOUBLE)) / 2.0)
       |      * ((CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1.0)
       |        - CAST(ty.v AS DOUBLE)) / 2.0))
       |  END AS tau_b
       |FROM a JOIN tx ON a.g = tx.g JOIN ty ON a.g = ty.g""".stripMargin

  // ---------------------------------------------------------------
  // q159 — the q144 KS statistic finished as a DECISION: asymptotic
  // p-value P(K > ks_z) under the null, via the KolmogorovQGrid
  // literal-interpolation discipline (exp() is not ulp-portable
  // across engines; a shared literal grid + one linear-interpolation
  // IEEE dag is). Closes the "ks_z left unscored" gap: the monitor
  // can now gate on "p < 0.01", not a raw critical value.
  // ---------------------------------------------------------------
  def q159KsPValue(spark: SparkSession, d: String): DataFrame =
    // the base statistic is q144's own timed row; here the timed
    // operator is the p-scoring (the q175 fixture discipline)
    QueryFixtures.ensure(spark, d, "q159_base_ks", "q159_ks_p_value")(
      { val s = scored(spark, d)
        graft.operators.StatTests.ksTwoSample(s, col("logit"), col("is_en")) })
      .withColumn("p_value",
        graft.operators.StatTests.kolmogorovPValue(col("ks_z")))

  val q159Sql: String =
    s"""WITH base AS ($q144Sql)
       |SELECT n_a, n_b, n_distinct_values, ks_stat, ks_at, ks_z,
       |  ${graft.operators.StatTests.kolmogorovPValueSql("ks_z")} AS p_value
       |FROM base""".stripMargin

  // ---------------------------------------------------------------
  // q160 — per-source KS drift (q147) scored: each source's
  // divergence from the rest of the corpus as a p-value, so the
  // drift dashboard ranks sources by evidence strength, not by a raw
  // D that conflates effect size with sample size. Same grid, same
  // dag, per group.
  // ---------------------------------------------------------------
  def q160GroupKsPValue(spark: SparkSession, d: String): DataFrame =
    QueryFixtures.ensure(spark, d, "q160_base_group_ks", "q160_group_ks_p_value")(
      q147GroupKs(spark, d))
      .withColumn("p_value",
        graft.operators.StatTests.kolmogorovPValue(col("ks_z")))

  val q160Sql: String =
    s"""WITH base AS ($q147Sql)
       |SELECT source, n_group, n_rest, n_distinct_values, ks_stat, ks_at, ks_z,
       |  ${graft.operators.StatTests.kolmogorovPValueSql("ks_z")} AS p_value
       |FROM base""".stripMargin

  // ---------------------------------------------------------------
  // q162 — the q146 Mann–Whitney z finished as a decision: two-sided
  // normal p-value via the NormalSfGrid literal-interpolation
  // discipline (erf is not ulp-portable; the shared survival-function
  // grid is). With q159 this closes the unscored-statistic class:
  // every z the engine emits now carries its evidence strength.
  // ---------------------------------------------------------------
  def q162RankSumP(spark: SparkSession, d: String): DataFrame =
    QueryFixtures.ensure(spark, d, "q162_base_rank_sum", "q162_rank_sum_p")(
      q146RankSum(spark, d))
      .withColumn("p_two_sided",
        graft.operators.StatTests.normalPTwoSided(col("z")))

  val q162Sql: String =
    s"""WITH base AS ($q146Sql)
       |SELECT n_pos, n_neg, n_distinct_scores, u, tie_term, z, cliffs_delta,
       |  ${graft.operators.StatTests.normalPTwoSidedSql("z")} AS p_two_sided
       |FROM base""".stripMargin

  // ---------------------------------------------------------------
  // q163 — per-source rank-sum p-values (q148 scored): the per-source
  // separation dashboard ranks by evidence, not by a raw z that a
  // small source can never reach.
  // ---------------------------------------------------------------
  def q163GroupRankSumP(spark: SparkSession, d: String): DataFrame =
    QueryFixtures.ensure(spark, d, "q163_base_group_rank_sum", "q163_group_rank_sum_p")(
      q148GroupRankSum(spark, d))
      .withColumn("p_two_sided",
        graft.operators.StatTests.normalPTwoSided(col("z")))

  val q163Sql: String =
    s"""WITH base AS ($q148Sql)
       |SELECT source, n_pos, n_neg, n_distinct_scores, u, tie_term, z, cliffs_delta,
       |  ${graft.operators.StatTests.normalPTwoSidedSql("z")} AS p_two_sided
       |FROM base""".stripMargin

  // ---------------------------------------------------------------
  // q164 — EXACT Kendall tau-b of the quality logit vs document
  // length, on a deterministic 5% md5 doc sample: q151's banded
  // approximation replaced by the exact cell-partitioned pair count
  // (cross-cell dominance + within-cell equi-join refinements). The
  // sample keeps the oracle's O(d^2) census pair join replayable in
  // DuckDB; the operator itself is full-corpus-capable (cells knob)
  // and spec-pinned against brute force at several cell counts.
  // ---------------------------------------------------------------
  def q164ExactKendall(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .filter(graft.operators.Sampling.hashScore(col("doc_id")) < lit(0.05))
      .withColumn("doc_len", col("n_chars"))
    val s = graft.operators.TextAnalysis.linearQualityScore(
      docs, "doc_id", "text",
      bias = -2.0, wStopword = 8.0, wPunct = -4.0,
      wMeanWordLen = 0.25, wKChars = 0.5,
      carry = Seq("doc_len"))
    graft.operators.Profiling.kendallTauExact(
      s, col("logit"), col("doc_len"), cells = 64)
  }

  val q164Sql: String = {
    val sample =
      "CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE) / 4294967296.0 < 0.05"
    s"""WITH q AS (${ExtensionQueries.q112Sql}),
       |s AS (SELECT q.logit AS x, CAST(d.n_chars AS DOUBLE) AS y
       |  FROM q JOIN documents d ON q.doc_id = d.doc_id
       |  WHERE $sample
       |    AND q.logit IS NOT NULL AND NOT isnan(q.logit)
       |    AND d.n_chars IS NOT NULL),
       |c AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY x, y),
       |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM c),
       |p AS (
       |  SELECT
       |    COALESCE(CAST(SUM(CASE WHEN a.x < b.x AND a.y < b.y
       |      THEN CAST(a.n AS DECIMAL(38,0)) * b.n END) AS DECIMAL(38,0)), 0) AS c,
       |    COALESCE(CAST(SUM(CASE WHEN a.x < b.x AND a.y > b.y
       |      THEN CAST(a.n AS DECIMAL(38,0)) * b.n END) AS DECIMAL(38,0)), 0) AS d
       |  FROM c a JOIN c b
       |    ON (a.x < b.x) OR (a.x = b.x AND a.y < b.y)),
       |tx AS (SELECT CAST(SUM(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS DECIMAL(38,0)) AS v,
       |    CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS HUGEINT) AS v2,
       |    CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (t - 2)) AS HUGEINT) AS v3
       |  FROM (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c GROUP BY x) m),
       |ty AS (SELECT CAST(SUM(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS DECIMAL(38,0)) AS v,
       |    CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS HUGEINT) AS v2,
       |    CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (t - 2)) AS HUGEINT) AS v3
       |  FROM (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c GROUP BY y) m),
       |txy AS (SELECT CAST(SUM(CAST(n AS DECIMAL(38,0)) * (n - 1)) AS DECIMAL(38,0)) AS v FROM c),
       |res AS (SELECT t.nn AS n,
       |  CAST(p.c AS DOUBLE) AS concordant, CAST(p.d AS DOUBLE) AS discordant,
       |  CAST(tx.v AS DOUBLE) AS tie_x2, CAST(ty.v AS DOUBLE) AS tie_y2,
       |  CAST(txy.v AS DOUBLE) AS tie_xy2,
       |  CASE WHEN (CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0)
       |        - CAST(tx.v AS DOUBLE)) / 2.0 > 0.0
       |    AND (CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0)
       |        - CAST(ty.v AS DOUBLE)) / 2.0 > 0.0
       |  THEN (CAST(p.c AS DOUBLE) - CAST(p.d AS DOUBLE))
       |    / SQRT(((CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0)
       |        - CAST(tx.v AS DOUBLE)) / 2.0)
       |      * ((CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0)
       |        - CAST(ty.v AS DOUBLE)) / 2.0))
       |  END AS tau_b,
       |  CASE WHEN t.nn > 2 AND
       |    (CAST(CAST(t.nn AS HUGEINT) * (t.nn - 1) * (2 * t.nn + 5)
       |        - tx.v2 - ty.v2 AS DOUBLE) / 18.0
       |      + CAST(CAST(tx.v AS HUGEINT) * CAST(ty.v AS HUGEINT) AS DOUBLE)
       |        / (2.0 * CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0))
       |      + CAST(tx.v3 * ty.v3 AS DOUBLE)
       |        / (9.0 * CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0)
       |           * (CAST(t.nn AS DOUBLE) - 2.0))) > 0.0
       |  THEN (CAST(p.c AS DOUBLE) - CAST(p.d AS DOUBLE))
       |    / SQRT(CAST(CAST(t.nn AS HUGEINT) * (t.nn - 1) * (2 * t.nn + 5)
       |        - tx.v2 - ty.v2 AS DOUBLE) / 18.0
       |      + CAST(CAST(tx.v AS HUGEINT) * CAST(ty.v AS HUGEINT) AS DOUBLE)
       |        / (2.0 * CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0))
       |      + CAST(tx.v3 * ty.v3 AS DOUBLE)
       |        / (9.0 * CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0)
       |           * (CAST(t.nn AS DOUBLE) - 2.0)))
       |  END AS z
       |FROM t CROSS JOIN p CROSS JOIN tx CROSS JOIN ty CROSS JOIN txy)
       |SELECT res.*,
       |  ${graft.operators.StatTests.normalPTwoSidedSql("z")} AS p_two_sided
       |FROM res""".stripMargin
  }

  // ---------------------------------------------------------------
  // q167 — the q139 Spearman rho finished as a decision: large-sample
  // z = rho*sqrt(n-1) and its two-sided normal p-value via the shared
  // NormalSfGrid dag — with q159/q162 this makes every correlation /
  // separation statistic in the engine evidence-scored.
  // ---------------------------------------------------------------
  private def spearmanScored(base: DataFrame): DataFrame = {
    val z = col("spearman_rho") * sqrt(col("n").cast("double") - lit(1.0))
    base.withColumn("z", z)
      .withColumn("p_two_sided",
        graft.operators.StatTests.normalPTwoSided(col("z")))
  }

  private def spearmanScoredSql(cols: String): String =
    s"""SELECT $cols, z,
       |  ${graft.operators.StatTests.normalPTwoSidedSql("z")} AS p_two_sided
       |FROM (SELECT *,
       |  spearman_rho * sqrt(CAST(n AS DOUBLE) - 1.0) AS z
       |  FROM base) t""".stripMargin

  def q167SpearmanP(spark: SparkSession, d: String): DataFrame =
    spearmanScored(QueryFixtures.ensure(spark, d, "q167_base_spearman", "q167_spearman_p")(
      q139LengthCorrelation(spark, d)))

  val q167Sql: String =
    s"""WITH base AS ($q139Sql)
       |${spearmanScoredSql("n, spearman_rho")}""".stripMargin

  // ---------------------------------------------------------------
  // q168 — per-source Spearman scored (q152 + z/p): the per-source
  // correlation dashboard ranked by evidence strength.
  // ---------------------------------------------------------------
  def q168GroupSpearmanP(spark: SparkSession, d: String): DataFrame =
    spearmanScored(QueryFixtures.ensure(spark, d, "q168_base_group_spearman", "q168_group_spearman_p")(
      q152GroupSpearman(spark, d)))

  val q168Sql: String =
    s"""WITH base AS ($q152Sql)
       |${spearmanScoredSql("source, n, spearman_rho")}""".stripMargin

  // ---------------------------------------------------------------
  // q169 — two-sample mean-difference z of the quality logit
  // (quantized to micro-units, exact decimal moments) between the
  // English and non-English cohorts: the parametric location leg of
  // the drift triptych (q144 KS = distribution, q146 rank-sum =
  // ordinal, this = mean shift in the metric's units), p-scored via
  // the shared normal grid.
  // ---------------------------------------------------------------
  def q169MeanDiffZ(spark: SparkSession, d: String): DataFrame =
    // the NaN guard lives INSIDE the projected expression (NaN → NULL
    // → excluded in the aggregate): a raw filter on the derived logit
    // would inline the whole feature tree into the scan Filter and
    // evaluate it twice per row (caught in-plan this round)
    graft.operators.StatTests.meanDiffZ(
      scored(spark, d),
      when(!isnan(col("logit")), bround(col("logit") * lit(1000000.0))),
      col("is_en"))

  private def meanDiffAggSql(src: String, groupSel: String, groupBy: String): String =
    s"""v AS (SELECT $groupSel
       |    CAST(round_even(logit * 1000000.0, 0) AS BIGINT) AS v,
       |    CASE WHEN is_en THEN 1 ELSE 0 END AS a
       |  FROM $src WHERE is_en IS NOT NULL AND NOT isnan(logit)),
       |ag AS (SELECT $groupBy
       |    CAST(SUM(a) AS BIGINT) AS n_a,
       |    CAST(SUM(1 - a) AS BIGINT) AS n_b,
       |    CAST(SUM(CASE WHEN a = 1 THEN CAST(v AS DECIMAL(38,0))
       |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS sa,
       |    CAST(SUM(CASE WHEN a = 1 THEN CAST(v AS DECIMAL(38,0)) * v
       |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS qa,
       |    CAST(SUM(CASE WHEN a = 0 THEN CAST(v AS DECIMAL(38,0))
       |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS sb,
       |    CAST(SUM(CASE WHEN a = 0 THEN CAST(v AS DECIMAL(38,0)) * v
       |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS qb
       |  FROM v $$groupBy2),
       |f AS (SELECT *,
       |    CASE WHEN n_a > 0 THEN CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) END AS mean_a,
       |    CASE WHEN n_b > 0 THEN CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) END AS mean_b,
       |    CASE WHEN n_a > 1 THEN
       |      (CAST(qa AS DOUBLE) - (CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
       |        / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) END AS var_a,
       |    CASE WHEN n_b > 1 THEN
       |      (CAST(qb AS DOUBLE) - (CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
       |        / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) END AS var_b
       |  FROM ag),
       |g AS (SELECT *,
       |    mean_a - mean_b AS mean_diff,
       |    CASE WHEN var_a IS NOT NULL AND var_b IS NOT NULL
       |      AND (var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE)) > 0.0
       |    THEN (mean_a - mean_b)
       |      / SQRT(var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE))
       |    END AS z
       |  FROM f)""".stripMargin
      .replace("$groupBy2", if (groupBy.isEmpty) "" else "GROUP BY g")

  val q169Sql: String =
    s"""WITH s AS ($scoredSql),
       |${meanDiffAggSql("s", "", "")}
       |SELECT n_a, n_b, mean_a, mean_b, var_a, var_b, mean_diff, z,
       |  ${graft.operators.StatTests.normalPTwoSidedSql("z")} AS p_two_sided
       |FROM g""".stripMargin

  // ---------------------------------------------------------------
  // q170 — per-source mean-difference z (q169 keyed by source): one
  // grouped aggregate, group-scale output, same finishing dag.
  // ---------------------------------------------------------------
  def q170GroupMeanDiffZ(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.meanDiffZBy(
      scored(spark, d), col("source"),
      when(!isnan(col("logit")), bround(col("logit") * lit(1000000.0))),
      col("is_en"))
      .withColumnRenamed("group_key", "source")

  val q170Sql: String =
    s"""WITH s AS ($scoredSql),
       |${meanDiffAggSql("s", "source AS g,", "g,")}
       |SELECT g AS source, n_a, n_b, mean_a, mean_b, var_a, var_b, mean_diff, z,
       |  ${graft.operators.StatTests.normalPTwoSidedSql("z")} AS p_two_sided
       |FROM g""".stripMargin

  // ---------------------------------------------------------------
  // q175 — Benjamini–Hochberg FDR gate over the per-source KS
  // p-values (q160): the multiple-testing correction that turns 20
  // per-source drift tests into a controlled discovery set (raw
  // p < 0.05 per source false-alarms every run at this width).
  // ---------------------------------------------------------------
  def q175BhDiscoveries(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.benjaminiHochberg(
      // the per-source p table is the FIXTURE (a drift dashboard
      // reads it materialized); the timed operator is the BH gate —
      // the q129/q133 amortization discipline. The oracle still
      // states the full from-scratch chain.
      QueryFixtures.ensure(spark, d, "q175_source_ks_p", "q175_bh_discoveries")(
        q160GroupKsPValue(spark, d)),
      col("p_value"), col("source"),
      alpha = 0.05)

  val q175Sql: String =
    s"""WITH base AS ($q160Sql),
       |mm AS (SELECT CAST(SUM(CASE WHEN p_value IS NOT NULL THEN 1 ELSE 0 END)
       |  AS BIGINT) AS m FROM base),
       |r AS (SELECT base.*, mm.m,
       |    CASE WHEN p_value IS NOT NULL THEN CAST(row_number() OVER (
       |      ORDER BY p_value ASC NULLS LAST, source ASC) AS BIGINT)
       |    END AS p_rank
       |  FROM base CROSS JOIN mm),
       |c AS (SELECT *,
       |    CASE WHEN p_value IS NOT NULL THEN
       |      CAST(p_rank AS DOUBLE) * 0.05 / CAST(m AS DOUBLE) END AS bh_critical
       |  FROM r),
       |k AS (SELECT MAX(CASE WHEN p_value <= bh_critical THEN p_value END) AS kp
       |  FROM c)
       |SELECT c.source, c.n_group, c.n_rest, c.n_distinct_values, c.ks_stat,
       |  c.ks_at, c.ks_z, c.p_value, c.p_rank, c.bh_critical,
       |  COALESCE(c.p_value <= k.kp, FALSE) AS is_discovery
       |FROM c CROSS JOIN k""".stripMargin

  // ---------------------------------------------------------------
  // q176 — per-source EXACT Kendall tau-b (q164 keyed by source):
  // which source's quality-length association differs, with exact
  // tie-corrected evidence. Shared global cell grid (pair counts are
  // cell-layout-invariant — spec-pinned bit-equal to solo per
  // group); same 5% sample so the per-source oracle pair joins stay
  // replayable.
  // ---------------------------------------------------------------
  def q176GroupExactKendall(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .filter(graft.operators.Sampling.hashScore(col("doc_id")) < lit(0.05))
      .withColumn("doc_len", col("n_chars"))
    val s = graft.operators.TextAnalysis.linearQualityScore(
      docs, "doc_id", "text",
      bias = -2.0, wStopword = 8.0, wPunct = -4.0,
      wMeanWordLen = 0.25, wKChars = 0.5,
      carry = Seq("doc_len", "source"))
    graft.operators.Profiling.kendallTauExactBy(
      s, col("source"), col("logit"), col("doc_len"), cells = 32)
      .withColumnRenamed("group_key", "source")
  }

  val q176Sql: String = {
    val sample =
      "CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE) / 4294967296.0 < 0.05"
    s"""WITH q AS (${ExtensionQueries.q112Sql}),
       |s AS (SELECT d.source AS g, q.logit AS x, CAST(d.n_chars AS DOUBLE) AS y
       |  FROM q JOIN documents d ON q.doc_id = d.doc_id
       |  WHERE $sample
       |    AND d.source IS NOT NULL
       |    AND q.logit IS NOT NULL AND NOT isnan(q.logit)
       |    AND d.n_chars IS NOT NULL),
       |c AS (SELECT g, x, y, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY g, x, y),
       |t AS (SELECT g, CAST(SUM(n) AS BIGINT) AS nn FROM c GROUP BY g),
       |p AS (
       |  SELECT a.g,
       |    COALESCE(CAST(SUM(CASE WHEN a.x < b.x AND a.y < b.y
       |      THEN CAST(a.n AS DECIMAL(38,0)) * b.n END) AS DECIMAL(38,0)), 0) AS c,
       |    COALESCE(CAST(SUM(CASE WHEN a.x < b.x AND a.y > b.y
       |      THEN CAST(a.n AS DECIMAL(38,0)) * b.n END) AS DECIMAL(38,0)), 0) AS d
       |  FROM c a JOIN c b
       |    ON a.g = b.g AND ((a.x < b.x) OR (a.x = b.x AND a.y < b.y))
       |  GROUP BY a.g),
       |tx AS (SELECT g, CAST(SUM(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS DECIMAL(38,0)) AS v,
       |    CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS HUGEINT) AS v2,
       |    CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (t - 2)) AS HUGEINT) AS v3
       |  FROM (SELECT g, CAST(SUM(n) AS BIGINT) AS t FROM c GROUP BY g, x) m GROUP BY g),
       |ty AS (SELECT g, CAST(SUM(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS DECIMAL(38,0)) AS v,
       |    CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS HUGEINT) AS v2,
       |    CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (t - 2)) AS HUGEINT) AS v3
       |  FROM (SELECT g, CAST(SUM(n) AS BIGINT) AS t FROM c GROUP BY g, y) m GROUP BY g),
       |txy AS (SELECT g, CAST(SUM(CAST(n AS DECIMAL(38,0)) * (n - 1)) AS DECIMAL(38,0)) AS v
       |  FROM c GROUP BY g),
       |res AS (SELECT t.g, t.nn AS n,
       |  CASE WHEN p.c IS NULL THEN 0.0 ELSE CAST(p.c AS DOUBLE) END AS concordant,
       |  CASE WHEN p.d IS NULL THEN 0.0 ELSE CAST(p.d AS DOUBLE) END AS discordant,
       |  CAST(tx.v AS DOUBLE) AS tie_x2, CAST(ty.v AS DOUBLE) AS tie_y2,
       |  CAST(txy.v AS DOUBLE) AS tie_xy2,
       |  CASE WHEN (CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0)
       |        - CAST(tx.v AS DOUBLE)) / 2.0 > 0.0
       |    AND (CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0)
       |        - CAST(ty.v AS DOUBLE)) / 2.0 > 0.0
       |  THEN (COALESCE(CAST(p.c AS DOUBLE), 0.0) - COALESCE(CAST(p.d AS DOUBLE), 0.0))
       |    / SQRT(((CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0)
       |        - CAST(tx.v AS DOUBLE)) / 2.0)
       |      * ((CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0)
       |        - CAST(ty.v AS DOUBLE)) / 2.0))
       |  END AS tau_b,
       |  CASE WHEN t.nn > 2 AND
       |    (CAST(CAST(t.nn AS HUGEINT) * (t.nn - 1) * (2 * t.nn + 5)
       |        - tx.v2 - ty.v2 AS DOUBLE) / 18.0
       |      + CAST(CAST(tx.v AS HUGEINT) * CAST(ty.v AS HUGEINT) AS DOUBLE)
       |        / (2.0 * CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0))
       |      + CAST(tx.v3 * ty.v3 AS DOUBLE)
       |        / (9.0 * CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0)
       |           * (CAST(t.nn AS DOUBLE) - 2.0))) > 0.0
       |  THEN (COALESCE(CAST(p.c AS DOUBLE), 0.0) - COALESCE(CAST(p.d AS DOUBLE), 0.0))
       |    / SQRT(CAST(CAST(t.nn AS HUGEINT) * (t.nn - 1) * (2 * t.nn + 5)
       |        - tx.v2 - ty.v2 AS DOUBLE) / 18.0
       |      + CAST(CAST(tx.v AS HUGEINT) * CAST(ty.v AS HUGEINT) AS DOUBLE)
       |        / (2.0 * CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0))
       |      + CAST(tx.v3 * ty.v3 AS DOUBLE)
       |        / (9.0 * CAST(t.nn AS DOUBLE) * (CAST(t.nn AS DOUBLE) - 1.0)
       |           * (CAST(t.nn AS DOUBLE) - 2.0)))
       |  END AS z
       |FROM t
       |LEFT JOIN p ON t.g = p.g
       |JOIN tx ON t.g = tx.g JOIN ty ON t.g = ty.g JOIN txy ON t.g = txy.g)
       |SELECT res.g AS source, res.n, res.concordant, res.discordant,
       |  res.tie_x2, res.tie_y2, res.tie_xy2, res.tau_b, res.z,
       |  ${graft.operators.StatTests.normalPTwoSidedSql("z")} AS p_two_sided
       |FROM res""".stripMargin
  }

  /** Queries whose first invocation materializes QueryFixtures state
    * (the composed bench rows time the OPERATOR; SparkEntry.benchSetup
    * warms every name listed here, so a new fixture-backed wrapper is
    * amortized by declaring it next to its fixture, not by editing a
    * hand-curated list in SparkEntry). */
  val fixtureBacked: Seq[String] = Seq(
    "q133_dedup_weighted_auc",
    "q159_ks_p_value", "q160_group_ks_p_value",
    "q162_rank_sum_p", "q163_group_rank_sum_p",
    "q167_spearman_p", "q168_group_spearman_p",
    "q175_bh_discoveries")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q119_auc"               -> (q119Auc _),
    "q120_calibration"       -> (q120Calibration _),
    "q124_group_auc"         -> (q124GroupAuc _),
    "q125_group_calibration" -> (q125GroupCalibration _),
    "q126_threshold_sweep"   -> (q126ThresholdSweep _),
    "q127_group_threshold_sweep" -> (q127GroupThresholdSweep _),
    "q130_gate_apply"        -> (q130GateApply _),
    "q131_ap"                -> (q131Ap _),
    "q132_group_ap"          -> (q132GroupAp _),
    "q133_dedup_weighted_auc" -> (q133DedupWeightedAuc _),
    "q134_auc_bootstrap"     -> (q134AucBootstrap _),
    "q137_brier_decomposition" -> (q137BrierDecomposition _),
    "q139_length_correlation" -> (q139LengthCorrelation _),
    "q140_group_brier"       -> (q140GroupBrier _),
    "q142_isotonic_calibration" -> (q142IsotonicCalibration _),
    "q143_group_isotonic"    -> (q143GroupIsotonic _),
    "q144_ks_two_sample"     -> (q144Ks _),
    "q146_rank_sum_z"        -> (q146RankSum _),
    "q147_group_ks_drift"    -> (q147GroupKs _),
    "q148_group_rank_sum"    -> (q148GroupRankSum _),
    "q151_kendall_tau"       -> (q151KendallTau _),
    "q152_group_spearman"    -> (q152GroupSpearman _),
    "q156_group_kendall"     -> (q156GroupKendall _),
    "q159_ks_p_value"        -> (q159KsPValue _),
    "q160_group_ks_p_value"  -> (q160GroupKsPValue _),
    "q162_rank_sum_p"        -> (q162RankSumP _),
    "q163_group_rank_sum_p"  -> (q163GroupRankSumP _),
    "q164_exact_kendall"     -> (q164ExactKendall _),
    "q167_spearman_p"        -> (q167SpearmanP _),
    "q168_group_spearman_p"  -> (q168GroupSpearmanP _),
    "q169_mean_diff_z"       -> (q169MeanDiffZ _),
    "q170_group_mean_diff_z" -> (q170GroupMeanDiffZ _),
    "q175_bh_discoveries"    -> (q175BhDiscoveries _),
    "q176_group_exact_kendall" -> (q176GroupExactKendall _))

  val oracleSql: Map[String, String] = Map(
    "q119_auc"               -> q119Sql,
    "q120_calibration"       -> q120Sql,
    "q124_group_auc"         -> q124Sql,
    "q125_group_calibration" -> q125Sql,
    "q126_threshold_sweep"   -> q126Sql,
    "q127_group_threshold_sweep" -> q127Sql,
    "q130_gate_apply"        -> q130Sql,
    "q131_ap"                -> q131Sql,
    "q132_group_ap"          -> q132Sql,
    "q133_dedup_weighted_auc" -> q133Sql,
    "q134_auc_bootstrap"     -> q134Sql,
    "q137_brier_decomposition" -> q137Sql,
    "q139_length_correlation" -> q139Sql,
    "q140_group_brier"       -> q140Sql,
    "q142_isotonic_calibration" -> q142Sql,
    "q143_group_isotonic"    -> q143Sql,
    "q144_ks_two_sample"     -> q144Sql,
    "q146_rank_sum_z"        -> q146Sql,
    "q147_group_ks_drift"    -> q147Sql,
    "q148_group_rank_sum"    -> q148Sql,
    "q151_kendall_tau"       -> q151Sql,
    "q152_group_spearman"    -> q152Sql,
    "q156_group_kendall"     -> q156Sql,
    "q159_ks_p_value"        -> q159Sql,
    "q160_group_ks_p_value"  -> q160Sql,
    "q162_rank_sum_p"        -> q162Sql,
    "q163_group_rank_sum_p"  -> q163Sql,
    "q164_exact_kendall"     -> q164Sql,
    "q167_spearman_p"        -> q167Sql,
    "q168_group_spearman_p"  -> q168Sql,
    "q169_mean_diff_z"       -> q169Sql,
    "q170_group_mean_diff_z" -> q170Sql,
    "q175_bh_discoveries"    -> q175Sql,
    "q176_group_exact_kendall" -> q176Sql)
}
