package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming extension of the calibration census (the batch
  * [[graft.operators.Evaluation.calibrationReport]], q120): a
  * continuously maintained per-window score-band census scored against
  * a static baseline report — "is the quality gate still calibrated on
  * live traffic?" as a standing query instead of a nightly batch. A
  * gate whose band-7 positive rate drifts from 0.92 to 0.60 is
  * mislabeling; catching that within a window beats discovering it in
  * next week's eval.
  *
  * Split into two stages like [[StreamingDrift]] (Structured Streaming
  * allows ONE aggregation per query): the STREAMING stage computes the
  * watermarked windowed (band → n, n_pos) census — bounded state,
  * ≤ open-windows × bins rows — and the calibration SCORING runs as a
  * cheap batch query over the census sink (windows × bins rows,
  * orders of magnitude under the stream): in `foreachBatch`, on a
  * schedule, or ad hoc.
  *
  * Batch parity: both stages are pure DataFrame → DataFrame, so the
  * identical code runs in batch mode; the spec pins the windowed
  * census against [[graft.operators.Evaluation.calibrationReport]]
  * window by window, including the late-data fold.
  */
object StreamingCalibration {

  /** Watermarked tumbling-window score-band census — the streaming
    * half. Bands follow [[graft.operators.Evaluation.calibrationReport]]:
    * fixed [lo, hi) domain, out-of-range scores clamped to the edge
    * bands, NULL/NaN scores and NULL labels excluded (the engine's
    * documented eval exclusion). Append-mode safe: a window's rows
    * emit once the watermark passes its end, and its state drops.
    */
  def windowedBandCensus(
      stream: DataFrame, scoreCol: String, labelCol: String,
      lo: Double, hi: Double, bins: Int,
      tsCol: String = "ts",
      windowLength: String = "1 hour",
      watermarkDelay: String = "1 hour"): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / bins
    val v = col(scoreCol).cast("double")
    val band = least(lit(bins - 1L),
      greatest(lit(0L), floor((v - lit(lo)) / lit(width))))
    stream
      .filter(col(scoreCol).isNotNull && !isnan(v) && col(labelCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), band.as("band"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("window.start").as("window_start"),
        col("band"), col("n"), col("n_pos"))
  }

  /** Per-GROUP watermarked windowed band census — [[windowedBandCensus]]
    * keyed by a group column (source, segment): the streaming half of
    * MAINTAINED per-source operating points. Rows with a NULL group
    * are excluded (the [[graft.operators.Evaluation.thresholdSweepBy]]
    * raw-filter convention, so the folded census matches the batch
    * sweep's input exactly). State stays bounded:
    * ≤ open-windows × groups × bins rows.
    *
    * The census sink is a PARTIALS LOG: each emitted (window, group,
    * band, n, n_pos) row is a mergeable integer partial, so
    * [[graft.operators.Evaluation.sweepFromBandCensus]] folds any
    * accumulation of them — per window, per day, or the full log —
    * into the exact batch threshold-sweep table, and
    * [[graft.operators.Evaluation.applyOperatingPoints]] turns that
    * into the q130 decision table without ever rescanning history.
    */
  def windowedBandCensusBy(
      stream: DataFrame, groupCol: String, scoreCol: String, labelCol: String,
      lo: Double, hi: Double, bins: Int,
      tsCol: String = "ts",
      windowLength: String = "1 hour",
      watermarkDelay: String = "1 hour"): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / bins
    val v = col(scoreCol).cast("double")
    val band = least(lit(bins - 1L),
      greatest(lit(0L), floor((v - lit(lo)) / lit(width))))
    stream
      .filter(col(scoreCol).isNotNull && !isnan(v) &&
        col(labelCol).isNotNull && col(groupCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength),
        col(groupCol).as("group_key"), band.as("band"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("window.start").as("window_start"),
        col("group_key"), col("band"), col("n"), col("n_pos"))
  }

  /** Gate-DISCRIMINATION monitor: per-window trapezoidal band-AUC
    * over a [[windowedBandCensus]] output — the streaming eval
    * family's third leg next to drift and calibration ("is the gate
    * still separating classes on live traffic?"). A window whose
    * band-AUC sags from the static [[graft.operators.Evaluation.aucExact]]
    * baseline is the earliest signal the scorer went stale.
    *
    * The value is exactly the Mann–Whitney/midrank AUC of
    * [[graft.operators.Evaluation.aucExact]] computed at BAND
    * granularity: bands are the distinct "scores" ascending, each
    * positive beats the negatives in strictly lower bands and
    * half-ties with its own band's negatives — i.e. the trapezoidal
    * area of the banded ROC. Against the exact AUC it coarsens ties
    * to band resolution (the standard census trade; with the same
    * [lo, hi, bins] the baseline is comparable band-AUC to band-AUC,
    * and equals exact AUC whenever the score is the band index —
    * spec-pinned). All arithmetic is the aucExact discipline: integer
    * counts, DECIMAL(38,0) rank sums, one final division; windows run
    * over ≤ open-windows × bins rows. NULL when a window has a single
    * class (AUC undefined, not 0.5).
    *
    * Batch query over the census sink (windows × bins rows), like
    * [[scoreCalibration]] — run in `foreachBatch` or ad hoc.
    */
  def scoreBandAuc(windowBands: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wPrev = W.partitionBy(col("window_start")).orderBy(col("band"))
      .rowsBetween(W.unboundedPreceding, -1)
    windowBands
      .select(col("window_start"), col("band"),
        col("n_pos"), (col("n") - col("n_pos")).as("_neg"))
      .withColumn("_cumNeg", coalesce(sum(col("_neg")).over(wPrev), lit(0L)))
      .groupBy(col("window_start"))
      .agg(
        sum(col("n_pos")).as("n_pos"),
        sum(col("_neg")).as("n_neg"),
        sum(col("n_pos").cast("decimal(38,0)") *
            (lit(2L) * col("_cumNeg") + col("_neg")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("_num"))
      .select(col("window_start"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          col("_num").cast("double") /
            (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("band_auc"))
  }

  /** Distribution-DRIFT monitor: per-window banded two-sample KS
    * between the window's score distribution and a static baseline
    * band census — the streaming analog of
    * [[graft.operators.StatTests.ksTwoSample]], completing the
    * windowed eval triad (calibration: rate gaps; band-AUC:
    * discrimination; banded KS: did the SCORE DISTRIBUTION itself
    * move). PSI-style bin drift censuses weight all bins equally;
    * the KS sup-gap is the single worst CDF divergence — the number
    * with distribution-free critical values.
    *
    * The statistic is the exact two-sample KS computed at BAND
    * granularity: both ECDFs step only at band edges, so
    * D = max_b |cumLive(b)/n_live − cumBase(b)/n_base| — equal to the
    * exact KS whenever the score is the band index (spec-pinned, the
    * [[scoreBandAuc]] convention), and a lower bound on it otherwise
    * (quantization can only hide divergence inside a band, never
    * invent it). All counts are exact Longs; the gap is the
    * engine-exact division/subtraction dag; `ks_z` scales by
    * sqrt(n_live·n_base/(n_live+n_base)) for Kolmogorov critical
    * values (1.358 ≈ α=0.05).
    *
    * `baseline` is a [[graft.operators.Evaluation.calibrationReport]]
    * output over the reference corpus. Both CDFs evaluate on the
    * UNION of the baseline and observed live band spines, zero-filled
    * per side — empty live bands still step the baseline CDF, and a
    * live band absent from the baseline spine (a bins/lo/hi mismatch)
    * still steps the live CDF instead of being silently dropped from
    * the cumulative while counted in the total. Batch query
    * over the census sink — ≤ windows × bins rows, windows
    * partitioned per window_start — run in `foreachBatch` or ad hoc.
    * Output per window: (window_start, n_live, n_base, band_ks,
    * ks_at_band — the smallest band attaining the sup — and ks_z);
    * statistic columns are NULL when either side is empty.
    */
  def scoreBandKs(windowBands: DataFrame, baseline: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    // both CDFs evaluate on the UNION band spine (baseline ∪ observed
    // live bands, ≤ 2×bins rows), zero-filled per side — so a live
    // band outside the baseline's spine still steps the live CDF
    // instead of being silently dropped (it contributes a gap of
    // live_cdf − base_cdf with the baseline side flat), and a
    // bins/lo/hi mismatch between census and baseline degrades to a
    // correct-on-observed-bands statistic rather than a quiet
    // undercount. The unpartitioned windows below are bounded by the
    // spine size by construction.
    val spine = windowBands.select(col("band"))
      .union(baseline.select(col("band"))).distinct()
    val wB = W.orderBy(col("band")).rowsBetween(W.unboundedPreceding, 0)
    val baseCum = spine
      .join(baseline.select(col("band"), col("n").as("_bn")), Seq("band"), "left")
      .withColumn("_bc", sum(coalesce(col("_bn"), lit(0L))).over(wB))
      .drop("_bn")
      .crossJoin(broadcast(
        baseline.select(col("n").as("_tbn")).agg(sum(col("_tbn")).as("_bt"))))
    val wins = windowBands.select(col("window_start")).distinct()
    val live = windowBands.select(col("window_start").as("_ws"),
      col("band").as("_b"), col("n").as("_ln"))
    val totals = windowBands.select(col("window_start").as("_tws"), col("n").as("_tn"))
      .groupBy(col("_tws")).agg(sum(col("_tn")).as("_lt"))
    val wWin = W.partitionBy(col("window_start")).orderBy(col("band"))
      .rowsBetween(W.unboundedPreceding, 0)
    val gaps = wins
      .crossJoin(broadcast(baseCum))
      .join(live, col("window_start") === col("_ws") && col("band") === col("_b"), "left")
      .drop("_ws", "_b")
      .join(totals, col("window_start") === col("_tws"))
      .drop("_tws")
      .withColumn("_lc", sum(coalesce(col("_ln"), lit(0L))).over(wWin))
      .select(col("window_start"), col("band"), col("_lt"), col("_bt"),
        when(col("_lt") > 0L && col("_bt") > 0L,
          abs(col("_lc").cast("double") / col("_lt").cast("double")
            - col("_bc").cast("double") / col("_bt").cast("double"))).as("_gap"))
    val mxPerW = gaps.groupBy(col("window_start").as("_mws"))
      .agg(max(col("_gap")).as("_mx"))
    gaps
      .join(mxPerW, col("window_start") === col("_mws"))
      .drop("_mws")
      .groupBy(col("window_start"))
      .agg(first(col("_lt")).as("n_live"),
        first(col("_bt")).as("n_base"),
        max(col("_gap")).as("band_ks"),
        min(when(col("_gap") === col("_mx"), col("band"))).as("ks_at_band"))
      .withColumn("ks_z",
        when(col("band_ks").isNotNull,
          sqrt(col("n_live").cast("double") * col("n_base").cast("double")
            / (col("n_live") + col("n_base")).cast("double")) * col("band_ks")))
  }

  /** Window-over-window banded KS: each window's score distribution
    * against its PREDECESSOR window — [[scoreBandKs]] with the
    * previous window as the moving baseline, i.e. the
    * [[graft.operators.StatTests.ksAdjacentPeriods]] drift timeline
    * as a standing query. A static-baseline monitor says "did we
    * drift from launch"; this says "did the distribution MOVE just
    * now" — the pair a drift dashboard plots together.
    *
    * Predecessor = the previous window PRESENT in the census (lag
    * over the window sequence, one bounded window over
    * retention-scale rows) — a silent-gap window pairs with the last
    * observed one, which is the comparison a monitor actually wants
    * after an outage. Both CDFs evaluate on the union band spine
    * (distinct observed bands, ≤ bins), zero-filled per window, so
    * empty bands still step the other side's CDF. The first window
    * has no predecessor and is omitted. Engine-exact as always:
    * integer cumulative counts, one division/subtraction dag,
    * order-free MAX, `ks_z` scaled for Kolmogorov critical values.
    * Output per window: (window_start, prev_start, n_live, n_prev,
    * band_ks, ks_at_band, ks_z).
    */
  def scoreBandKsAdjacent(windowBands: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    // every branch re-aliases window_start/band at its source — the
    // census plan is shared four ways and bare self-joins would carry
    // conflicting references (the scoreCalibration discipline)
    val wins = windowBands.select(col("window_start").as("_w0")).distinct()
      .withColumn("_prev", lag(col("_w0"), 1).over(W.orderBy(col("_w0"))))
      .filter(col("_prev").isNotNull)
    val bandSpine = windowBands.select(col("band").as("_sb")).distinct()
    val live = windowBands.select(col("window_start").as("_lws"),
      col("band").as("_lb"), col("n").as("_ln"))
    val grid = windowBands.select(col("window_start").as("_gws")).distinct()
      .crossJoin(broadcast(bandSpine))
      .join(live, col("_gws") === col("_lws") && col("_sb") === col("_lb"), "left")
      .drop("_lws", "_lb")
      .withColumn("_nz", coalesce(col("_ln"), lit(0L)))
    val wCum = W.partitionBy(col("_gws")).orderBy(col("_sb"))
      .rowsBetween(W.unboundedPreceding, 0)
    val cum = grid.withColumn("_c", sum(col("_nz")).over(wCum))
      .select(col("_gws"), col("_sb"), col("_c"))
    val tot = windowBands.select(col("window_start").as("_tws"), col("n").as("_tn"))
      .groupBy(col("_tws")).agg(sum(col("_tn")).as("_t"))
    val cur = cum
      .join(tot, col("_gws") === col("_tws")).drop("_tws")
    val prev = cum.select(col("_gws").as("_pws"), col("_sb").as("_pb"),
        col("_c").as("_pc"))
      .join(tot.select(col("_tws").as("_ptws"), col("_t").as("_pt")),
        col("_pws") === col("_ptws")).drop("_ptws")
    val gaps = wins
      .join(cur, col("_w0") === col("_gws")).drop("_gws")
      .join(prev, col("_prev") === col("_pws") && col("_sb") === col("_pb"))
      .drop("_pws", "_pb")
      .select(col("_w0"), col("_prev"), col("_sb"),
        col("_t"), col("_pt"),
        abs(col("_c").cast("double") / col("_t").cast("double")
          - col("_pc").cast("double") / col("_pt").cast("double")).as("_gap"))
    val mxPerW = gaps.groupBy(col("_w0").as("_mws"))
      .agg(max(col("_gap")).as("_mx"))
    gaps
      .join(mxPerW, col("_w0") === col("_mws")).drop("_mws")
      .groupBy(col("_w0").as("window_start"))
      .agg(first(col("_prev")).as("prev_start"),
        first(col("_t")).as("n_live"),
        first(col("_pt")).as("n_prev"),
        max(col("_gap")).as("band_ks"),
        min(when(col("_gap") === col("_mx"), col("_sb"))).as("ks_at_band"))
      .withColumn("ks_z",
        when(col("band_ks").isNotNull,
          sqrt(col("n_live").cast("double") * col("n_prev").cast("double")
            / (col("n_live") + col("n_prev")).cast("double")) * col("band_ks")))
  }

  /** Score a windowed band census against a static baseline
    * calibration report — the batch half.
    *
    * `baseline` is a [[graft.operators.Evaluation.calibrationReport]]
    * output (band, lo, hi, n, n_pos, pos_rate) over the reference
    * corpus; its full band spine is reused here, so every window
    * reports ALL bands (empty bands n=0) and reliability diagrams
    * align across windows and against the baseline. Per (window,
    * band): live counts and positive rate, the baseline rate, their
    * gap, and the ECE-style contribution |gap|·n/window_total —
    * summing `ece_contribution` per window gives the window's
    * expected calibration error against the baseline. Pure counts and
    * single divisions; aggregate-scale only.
    *
    * Coverage caveat, made explicit: a band the baseline never
    * populated (baseline_pos_rate NULL — pos_rate is NULL for empty
    * baseline bands) has no reference rate, so its `rate_gap` and
    * `ece_contribution` are NULL and the per-window Σece is
    * CONDITIONAL on baseline-covered bands. Live traffic drifting
    * into such bands is exactly the drift a conditional ECE would
    * understate, so that mass is surfaced per row as
    * `uncovered_mass` = n/window_total on uncovered bands (0.0 on
    * covered ones): Σuncovered_mass per window is the fraction of
    * live traffic the ECE could not see — alert on it alongside Σece.
    */
  def scoreCalibration(
      windowBands: DataFrame, baseline: DataFrame): DataFrame = {
    val wins = windowBands.select(col("window_start")).distinct()
    // re-aliased lineages: wins/totals/live all derive from the same
    // windowBands plan — distinct column names per branch keep the
    // self-joins unambiguous
    val totals = windowBands.select(col("window_start").as("_tws"), col("n").as("_tn"))
      .groupBy(col("_tws")).agg(sum(col("_tn")).as("_tw"))
    val spine = wins.crossJoin(broadcast(
      baseline.select(col("band"), col("lo"), col("hi"),
        col("pos_rate").as("baseline_pos_rate"))))
    val live = windowBands.select(col("window_start").as("_ws"),
      col("band").as("_b"), col("n"), col("n_pos"))
    val joined = spine
      .join(live, col("window_start") === col("_ws") && col("band") === col("_b"), "left")
      .drop("_ws", "_b")
      .join(totals, col("window_start") === col("_tws"))
      .drop("_tws")
      .select(
        col("window_start"), col("band"), col("lo"), col("hi"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        col("baseline_pos_rate"), col("_tw"))
    val rate = when(col("n") > 0L,
      col("n_pos").cast("double") / col("n").cast("double"))
    val gap = when(col("n") > 0L && col("baseline_pos_rate").isNotNull,
      col("n_pos").cast("double") / col("n").cast("double") - col("baseline_pos_rate"))
    joined.select(
      col("window_start"), col("band"), col("lo"), col("hi"),
      col("n"), col("n_pos"),
      rate.as("pos_rate"),
      col("baseline_pos_rate"),
      gap.as("rate_gap"),
      when(gap.isNotNull,
        abs(gap) * col("n").cast("double") / col("_tw").cast("double"))
        .as("ece_contribution"),
      when(col("baseline_pos_rate").isNull && col("n") > 0L,
        col("n").cast("double") / col("_tw").cast("double"))
        .otherwise(lit(0.0)).as("uncovered_mass"))
  }
}
