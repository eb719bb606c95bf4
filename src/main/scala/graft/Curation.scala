package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** End-to-end training-data curation: the composition every LLM-data
  * pipeline runs, built entirely from this engine's oracle-pinned
  * operators —
  *
  *   quality filter → language filter → exact dedup → MinHash-LSH
  *   near-dedup → deterministic split → split-partitioned sink.
  *
  * Every stage is a lazy DataFrame transform; the only actions are
  * the per-stage counts for the funnel report and the final write.
  * At 100 TB each stage keeps its designed shape: quality/language
  * are per-row expressions at the scan, exact dedup shuffles
  * (hash, id) pairs, near-dedup is the banded LSH path (never
  * all-pairs), the split is a hash predicate, and the sink
  * partitions by split so downstream training jobs prune.
  */
object Curation {

  /** Per-stage surviving row counts plus the kept output. */
  final case class CurationReport(
      input: Long,
      afterQuality: Long,
      afterLanguage: Long,
      afterExactDedup: Long,
      afterNearDedup: Long,
      splits: Map[String, Long])

  /** Tunables, defaulted to the usual cheap-filter settings. */
  final case class CurationConfig(
      minTokens: Long = 5L,
      maxPunctRatio: Double = 0.2,
      keepLangs: Seq[String] = Seq("en", "de", "es", "fr", "zh"),
      shingleN: Int = 3,
      minhashHashes: Int = 64,
      minhashBands: Int = 8,
      nearDupThreshold: Double = 0.8,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))

  def curate(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      outPath: String,
      config: CurationConfig = CurationConfig()): CurationReport = {
    val cfg = config
    val input = docs.count()

    // 1. cheap per-row quality gate (q18's features)
    val quality = TextAnalysis.qualityFeatures(docs, idCol, textCol)
      .filter(col("n_tokens") >= cfg.minTokens &&
        col("punct_ratio") <= cfg.maxPunctRatio)
      .select(col(idCol))
    val qualityDocs = docs.join(quality, Seq(idCol), "left_semi")
    val afterQuality = qualityDocs.count()

    // 2. language gate (q17's heuristic; a model-based ID drops in)
    val langDocs = qualityDocs.filter(
      TextAnalysis.langId(col(textCol)).isin(cfg.keepLangs: _*))
    val afterLanguage = langDocs.count()

    // 3. exact dedup — keep the min-id representative per content hash
    val exact = Dedup.dropExactDuplicates(langDocs, idCol, col(textCol))
    val afterExact = exact.count()

    // 4. near-dedup: LSH candidates above threshold; drop the higher
    // id of each pair (greedy per-pair — at most one survivor per
    // connected near-dup component's min id chain)
    val (pairs, sigs) = Dedup.lshCandidatePairsWithSignatures(
      exact, idCol, textCol, cfg.shingleN, cfg.minhashHashes, cfg.minhashBands)
    val drop = pairs.filter(col("est_jaccard") >= cfg.nearDupThreshold)
      .select(col("id_b").as(idCol)).distinct()
    val nearDeduped = exact.join(drop, Seq(idCol), "left_anti")
    val afterNear = nearDeduped.count()
    sigs.unpersist()

    // 5. deterministic split + split-partitioned sink
    val split = Sampling.deterministicSplit(nearDeduped, idCol, cfg.splits)
    split.write.mode("overwrite").partitionBy("split").parquet(outPath)
    val written = spark.read.parquet(outPath)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    CurationReport(input, afterQuality, afterLanguage, afterExact, afterNear, written)
  }
}
