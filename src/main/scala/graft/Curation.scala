package graft

import graft.CacheLifecycle.FreshPersist
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.DqFunctions
import graft.operators.{Decontamination, Dedup, Sampling, TextAnalysis}

/** End-to-end training-data curation: the composition every LLM-data
  * pipeline runs, built entirely from this engine's oracle-pinned
  * operators —
  *
  *   quality filter → language filter → exact dedup → MinHash-LSH
  *   near-dedup → benchmark decontamination (optional) →
  *   deterministic split → split-partitioned sink.
  *
  * Quality and language are per-row predicates evaluated AT the scan
  * (no join, no second pass); exact dedup shuffles (hash, id) pairs;
  * near-dedup is the banded LSH path (never all-pairs);
  * decontamination semi-joins a broadcast benchmark shingle set; the
  * split is a hash predicate; the sink partitions by split so
  * downstream training jobs prune. Each surviving stage is persisted
  * so the funnel counts and the final write execute every stage once,
  * and all caches are released before returning.
  */
object Curation {

  /** Per-stage surviving row counts plus the kept output.
    * `afterDecontamination == afterNearDedup` when no benchmark was
    * supplied (the stage is skipped entirely, not run vacuously).
    */
  final case class CurationReport(
      input: Long,
      afterQuality: Long,
      afterLanguage: Long,
      afterExactDedup: Long,
      afterNearDedup: Long,
      afterDecontamination: Long,
      splits: Map[String, Long])

  /** Tunables, defaulted to the usual cheap-filter settings. Split
    * fractions must sum to 1 (a shortfall would route rows to a null
    * split). minhashBands = 16 (4-row bands) keeps LSH candidate
    * recall ≈ 0.9998 at jaccard 0.8 — 8-row bands would silently
    * miss ~23% of true near-dup pairs at the threshold.
    */
  final case class CurationConfig(
      minTokens: Long = 5L,
      maxPunctRatio: Double = 0.2,
      keepLangs: Seq[String] = Seq("en", "de", "es", "fr", "zh"),
      shingleN: Int = 3,
      minhashHashes: Int = 64,
      minhashBands: Int = 16,
      nearDupThreshold: Double = 0.8,
      clusterNearDups: Boolean = false,
      canonicalBy: Option[org.apache.spark.sql.Column] = None,
      decontamNgram: Int = 8,
      decontamMinOverlap: Long = 1L,
      decontamBloom: Boolean = false,
      decontamFpp: Double = 0.01,
      extraRules: Seq[graft.operators.Checks.ValidationRule] = Seq.empty,
      splitByCluster: Boolean = false,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)) {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    require(canonicalBy.isEmpty || clusterNearDups,
      "canonicalBy selects the survivor PER CLUSTER — it requires " +
        "clusterNearDups = true (the pairwise-greedy policy has no cluster to rank)")
  }

  /** The per-row quality gate (also the streaming front-end's filter:
    * [[graft.streaming.StreamingCuration]] applies the identical
    * predicate, so batch and stream admit the same rows).
    *
    * `cfg.extraRules` ([[graft.operators.Checks.ValidationRule]])
    * fold into this gate with quarantine semantics — FALSE or NULL
    * rejects — so corpus-specific constraints (schema bounds, source
    * allow-lists, float sanity) ride the same scan-time predicate in
    * batch AND streaming, with no extra pass.
    */
  def qualityPredicate(textCol: org.apache.spark.sql.Column, cfg: CurationConfig): org.apache.spark.sql.Column = {
    val nChars = length(textCol)
    val nPunct = nChars - length(regexp_replace(textCol, "[.,;:!?]", ""))
    val punctRatio = when(nChars > 0,
      nPunct.cast("double") / nChars.cast("double")).otherwise(lit(0.0))
    val base =
      DqFunctions.tokenCount(textCol) >= cfg.minTokens && punctRatio <= cfg.maxPunctRatio
    cfg.extraRules.foldLeft(base)((acc, r) => acc && coalesce(r.valid, lit(false)))
  }

  /** The per-row language gate (shared with the streaming front-end). */
  def languagePredicate(textCol: org.apache.spark.sql.Column, cfg: CurationConfig): org.apache.spark.sql.Column =
    TextAnalysis.langId(textCol).isin(cfg.keepLangs: _*)

  def curate(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      outPath: String,
      cfg: CurationConfig = CurationConfig(),
      benchmark: Option[DataFrame] = None): CurationReport = {
    val input = docs.count()

    // 1+2. per-row quality and language gates, evaluated at the scan
    // (the same expressions qualityFeatures/langId project in q17/q18)
    val t = col(textCol)
    val qualityDocs = docs.filter(qualityPredicate(t, cfg)).persistFresh()
    val afterQuality = qualityDocs.count()
    val langDocs = qualityDocs.filter(languagePredicate(t, cfg)).persistFresh()
    val afterLanguage = langDocs.count()

    // 3. exact dedup — keep the min-id representative per content hash
    val exact = Dedup.dropExactDuplicates(langDocs, idCol, t).persistFresh()
    val afterExact = exact.count()

    // 4. near-dedup. Two keep policies over the thresholded pair set:
    //  - pairwise-greedy (default): drop the higher id of every pair.
    //    A doc survives iff it is not the larger element of any pair;
    //    local minima of disjoint pair neighborhoods inside one
    //    component can all survive.
    //  - cluster-canonical (clusterNearDups = true): collapse pairs
    //    into connected components (duplicateClusters) and keep ONE
    //    doc per component — the usual web-corpus policy (a
    //    boilerplate family chained A~B~C is one cluster even when
    //    A~C alone is sub-threshold). More aggressive than greedy.
    //    The survivor is the min-id member by default; canonicalBy
    //    keeps the member with the HIGHEST value of the given
    //    expression instead (quality-aware canonicals — e.g. longest
    //    or best-scored doc), id-ascending tiebreak.
    val (pairs, sigs) = Dedup.lshNearDupPairsWithSignatures(
      exact, idCol, textCol, cfg.shingleN, cfg.minhashHashes, cfg.minhashBands,
      threshold = cfg.nearDupThreshold)
    val drop =
      if (cfg.clusterNearDups) {
        val clusters = Dedup.duplicateClusters(pairs, "id_a", "id_b")
        cfg.canonicalBy match {
          case Some(canon) =>
            // evaluate the canonical score on the cluster MEMBERS only
            // (pair-scale join, never corpus-wide); components are
            // small by construction so the per-cluster window is cheap
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col("cluster_id"))
              .orderBy(col("_canonical").desc, col(idCol).asc)
            exact.select(col(idCol), canon.as("_canonical"))
              .join(clusters.withColumnRenamed("id", idCol), idCol)
              .withColumn("_rk", row_number().over(w))
              .filter(col("_rk") > 1)
              .select(col(idCol))
          case None =>
            clusters.filter(col("id") =!= col("cluster_id")) // keep min id
              .select(col("id").as(idCol))
        }
      } else pairs.select(col("id_b").as(idCol)).distinct()
    val nearDeduped = exact.join(drop, Seq(idCol), "left_anti").persistFresh()
    val afterNear = nearDeduped.count()

    // 5. benchmark decontamination (skipped when no eval set given):
    // broadcast the benchmark's n-gram set — or, with decontamBloom,
    // its Bloom sketch (same kept set, for benchmark sets too big to
    // broadcast exactly) — and anti-join overlapping docs
    val cleaned = benchmark match {
      case Some(bench) =>
        val dropFn =
          if (cfg.decontamBloom)
            Decontamination.decontaminateBloom(nearDeduped, bench, idCol, textCol,
              cfg.decontamNgram, cfg.decontamMinOverlap, cfg.decontamFpp)
          else
            Decontamination.decontaminate(nearDeduped, bench, idCol, textCol,
              cfg.decontamNgram, cfg.decontamMinOverlap)
        dropFn.persistFresh()
      case None => nearDeduped
    }
    val afterDecontam = benchmark.fold(afterNear)(_ => cleaned.count())

    // 6. deterministic split + split-partitioned sink (executes the
    // persisted survivors, so upstream caches can then be released).
    // splitByCluster keys the split on the near-dup CLUSTER
    // representative (Sampling.clusterSafeSplit): under the default
    // pairwise-greedy dedup policy, several members of one near-dup
    // family can survive, and a row-hashed split would let them
    // straddle train/test — the leakage q95 audits, prevented here by
    // construction. (Under clusterNearDups one survivor per family
    // remains and the two keyings coincide except for sub-threshold
    // relatives.) Reuses the SAME pair set the dedup stage mined —
    // no second LSH pass.
    val split =
      if (cfg.splitByCluster) {
        val clusters = Dedup.duplicateClusters(pairs, "id_a", "id_b")
          .select(col("id").as(idCol), col("cluster_id"))
        Sampling.clusterSafeSplit(cleaned, idCol, clusters, idCol, "cluster_id",
          cfg.splits)
      } else Sampling.deterministicSplit(cleaned, idCol, cfg.splits)
    split.write.mode("overwrite").partitionBy("split").parquet(outPath)
    val written = spark.read.parquet(outPath)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every configured split gets a key — an empty split writes no
    // partition directory but still reports 0
    val splitCounts = cfg.splits.map { case (name, _) =>
      name -> written.getOrElse(name, 0L)
    }.toMap

    (Seq(sigs, qualityDocs, langDocs, exact, nearDeduped) ++
      (if (benchmark.isDefined) Seq(cleaned) else Nil)).foreach(_.unpersist())
    CurationReport(input, afterQuality, afterLanguage, afterExact, afterNear,
      afterDecontam, splitCounts)
  }
}
