package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Mergeable bounded-error quantile sketch: a deterministic BOTTOM-K
  * (KMV-style) row sample keyed by the portable 60-bit md5 hash —
  * the quantile member of the engine's mergeable-sketch family
  * (HLL distinct, CMS frequency, fixed-grid histograms), closing the
  * r10 gap that streaming distribution tests were band-granular only.
  *
  * The sketch of a corpus is the k rows with the smallest
  * `(md5_60(rowId), value)` — a pure function of the input MULTISET,
  * so merging any disjoint sharding of the input (by batch, by
  * source, by backfill order) equals the single-pass sketch EXACTLY,
  * in any merge order or tree shape (spec-pinned, the
  * [[Incremental.mergePartials]] contract). Under the md5-as-uniform
  * model the sketch is a uniform k-row sample, so any empirical
  * quantile read from it has rank error O(√(ln(2/δ)/2k)) with
  * probability 1−δ (DKW): ~2.1% at k=4096, δ=1e-4 — the resolution
  * knob is k. Error is in RANK, not value: correct for monitoring
  * quantiles/PSI/KS on arbitrary distributions.
  *
  * WHY NOT literal KLL: KLL's compactions keep alternating ranks of
  * whatever buffer has accumulated, so the result depends on merge
  * ORDER — a distributed tree-merge is irreproducible across
  * partitionings, which fails both the engine's property specs
  * (merge == single-pass would be false) and the DuckDB oracle
  * (nothing to replay). KLL's space advantage — O((1/ε)·log²(1/δ))
  * vs the sample's O(1/ε²) — only bites at ε well below the ~1%
  * monitoring resolution this family targets; at k ≤ 2²⁰ the sketch
  * is still < 16 MB and broadcastable. The trade is documented, like
  * ks_z's unscored p-value and banded-only exact Kendall.
  *
  * 100 TB shape: the sketch build is the salted two-phase top-k
  * ([[Sampling.prioritySample]]'s machinery) — phase 1 ranks inside
  * `salts` hash shards, phase 2 ranks the ≤ salts·k survivors; no
  * task ever sorts the corpus and only (h, v) longs/doubles ride the
  * shuffle. Merges and quantile reads touch sketch-sized frames
  * only.
  */
object QuantileSketch {

  /** Bottom-k over (h, v): the shared salted two-phase top-k core.
    * Phase 2's window is unpartitioned but bounded by construction
    * (≤ salts·k rows survive phase 1).
    */
  private def bottomK(hv: DataFrame, k: Int, salts: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val order = Seq(col("h").asc, col("v").asc)
    val perSalt = W.partitionBy(pmod(col("h"), lit(salts.toLong)))
      .orderBy(order: _*)
    val global = W.partitionBy().orderBy(order: _*)
    hv.withColumn("_sr", row_number().over(perSalt))
      .filter(col("_sr") <= k)
      .withColumn("_r", row_number().over(global))
      .filter(col("_r") <= k)
      .select(col("h"), col("v"))
  }

  /** Build the sketch: the k (h, v) rows with the smallest
    * `(md5_60(rowId), value)`. Rows with NULL id, NULL value or NaN
    * are excluded (no hash / no place in a CDF). `rowId` must be
    * unique per row for the uniform-sample guarantee (duplicate ids
    * collapse to one hash and under-weight their rows — the
    * [[Sampling.deterministicSample]] caveat).
    */
  def sketchPartials(
      df: DataFrame, value: Column, rowId: Column, k: Int,
      salts: Int = 32): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val hv = df.select(
        graft.functions.Md5Expressions
          .md5PrefixLong(rowId.cast("string"), 15).as("h"),
        value.cast("double").as("v"))
      .filter(col("h").isNotNull && col("v").isNotNull && !isnan(col("v")))
    bottomK(hv, k, salts)
  }

  /** Merge sketches (an at-rest history and delta batches, or shards
    * of a backfill): SET-union over (h, v) + bottom-k. The distinct
    * is load-bearing, not hygiene: h identifies the source ROW, so a
    * row present in several inputs (a re-merged compaction range, a
    * replayed batch in an at-least-once log) must count once — a
    * plain multiset bottom-k would rank its duplicates separately
    * and silently halve the distinct sample. With it, merge is
    * associative, commutative, and idempotent, so batches land in
    * any order and a compaction of a closed range swaps in place of
    * its inputs (the [[Profiling.mergeCountMin]] discipline).
    * Inputs are sketch-sized, so this never touches data-scale rows.
    */
  def merge(k: Int, parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "at least one sketch required")
    bottomK(
      parts.map(_.select(col("h"), col("v"))).reduce(_.unionByName(_)).distinct(),
      k, salts = 32)
  }

  /** Empirical quantiles from a sketch: for each p, the value at rank
    * max(1, ceil(p·n)) in the sketch's value order (the lower
    * empirical quantile — deterministic, oracle-replayable; n = actual
    * sketch size, which is < k for a corpus smaller than k). Output:
    * (p, q, n) — one row per requested probability. The rank window
    * is unpartitioned but sketch-bounded (≤ k rows).
    */
  def quantiles(sketch: DataFrame, probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty, "at least one probability required")
    require(probs.forall(p => p > 0.0 && p <= 1.0),
      s"probabilities must be in (0, 1], got $probs")
    val W = org.apache.spark.sql.expressions.Window
    val spark = sketch.sparkSession
    val pDf = spark.createDataset(probs)(Encoders.scalaDouble).toDF("p")
    val ranked = sketch
      .select(col("v"))
      .withColumn("_r", row_number().over(
        W.partitionBy().orderBy(col("v").asc)))
      .crossJoin(broadcast(
        sketch.agg(count(lit(1)).as("n"))))
    ranked
      .crossJoin(broadcast(pDf))
      .filter(col("_r") === greatest(lit(1L), ceil(col("p") * col("n"))))
      .select(col("p"), col("v").as("q"), col("n"))
  }

  /** Exact two-sample KS between two sketches' value samples — the
    * bounded-error streaming KS the banded monitors could not give
    * (band granularity hid within-band divergence; the sketch's
    * error is a known rank bound instead). Sketch-sized input, the
    * [[StatTests.ksTwoSample]] dag.
    */
  def sketchKs(a: DataFrame, b: DataFrame): DataFrame =
    StatTests.ksTwoSample(
      a.select(col("v"), lit(true).as("_ina"))
        .unionByName(b.select(col("v"), lit(false).as("_ina"))),
      col("v"), col("_ina"))
}
