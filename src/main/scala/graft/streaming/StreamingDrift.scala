package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming extension of the drift checks (SURVEY.md §2.10 + the
  * batch [[graft.operators.Checks.categoricalDrift]]): a continuously
  * maintained per-window category census scored against a static
  * baseline — "is today's traffic mix still yesterday's?" as a
  * standing query instead of a nightly batch.
  *
  * Split into two stages on purpose, because Structured Streaming
  * allows ONE aggregation per query: the STREAMING stage computes the
  * watermarked windowed census (bounded state — closed windows drop),
  * and the drift SCORING runs as a cheap batch query over the census
  * sink (census-scale: windows × categories rows, orders of magnitude
  * under the stream) — in `foreachBatch`, on a schedule, or ad hoc.
  * Scoring needs per-window totals, which would be a second chained
  * aggregation inside a single streaming query; over the census table
  * it is a trivially small groupBy.
  *
  * Batch parity: both stages are pure DataFrame → DataFrame, so the
  * identical code runs in batch mode (unified API) and the spec pins
  * the scored result against [[graft.operators.Checks.categoricalDrift]]
  * window by window.
  */
object StreamingDrift {

  /** Watermarked tumbling-window category census — the streaming
    * half. Append-mode safe: a window's rows emit once the watermark
    * passes its end, and its state is dropped (bounded by open
    * windows × categories at any input scale).
    */
  def windowedCategoryCensus(
      stream: DataFrame, catCol: String, tsCol: String = "ts",
      windowLength: String = "1 hour",
      watermarkDelay: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col(catCol))
      .agg(count(lit(1)).as("n_current"))
      .select(
        col("window.start").as("window_start"),
        col(catCol), col("n_current"))

  /** Score a windowed census against a static baseline — the batch
    * half, [[graft.operators.Checks.categoricalDrift]]'s arithmetic
    * applied per window: expected = baseline fraction × window
    * total, chi-square contribution localizes WHICH category moved,
    * `new_category` marks mass the baseline never saw (no finite
    * contribution), and a vanished category still contributes its
    * full expected count because the spine is windows × baseline
    * categories, not just observed pairs. Pure +,*,/ — engine-exact.
    *
    * Scale: the census and baseline are both aggregate-sized; the
    * spine cross-product is windows × categories. Baseline census
    * broadcasts; no row-scale data is touched.
    */
  def scoreDrift(
      windowCounts: DataFrame, baseline: DataFrame, catCol: String): DataFrame = {
    val base = baseline.groupBy(col(catCol)).agg(count(lit(1)).as("n_baseline"))
    val baseTotal = base.agg(sum(col("n_baseline")).as("_tb"))
    val totals = windowCounts.groupBy(col("window_start"))
      .agg(sum(col("n_current")).as("_tc"))
    // spine: every (window, baseline-or-observed category) pair —
    // null-SAFE on the category so a NULL class neither splits nor
    // drops (the categoricalDrift discipline)
    val cats = base.select(col(catCol)).unionByName(
        windowCounts.select(col(catCol))).distinct()
    val spine = totals.crossJoin(broadcast(cats))
    val joined = spine
      .join(broadcast(base.withColumnRenamed(catCol, "_bcat")),
        col(catCol) <=> col("_bcat"), "left")
      .drop("_bcat")
      .join(
        windowCounts
          .withColumnRenamed(catCol, "_wcat")
          .withColumnRenamed("window_start", "_wstart"),
        col("window_start") === col("_wstart") && col(catCol) <=> col("_wcat"),
        "left")
      .drop("_wcat", "_wstart")
      .select(col("window_start"), col(catCol),
        coalesce(col("n_current"), lit(0L)).as("n_current"),
        coalesce(col("n_baseline"), lit(0L)).as("n_baseline"),
        col("_tc"))
      .crossJoin(broadcast(baseTotal))
    val expected = col("n_baseline").cast("double") / col("_tb").cast("double") *
      col("_tc").cast("double")
    val defined = col("n_baseline") > 0 && col("_tc") > 0
    joined
      // a category observed only in SOME OTHER window contributes
      // nothing here: without baseline mass and without current rows
      // the (window, category) cell is vacuous, not "new"
      .filter(col("n_baseline") > 0 || col("n_current") > 0)
      .select(
      col("window_start"), col(catCol), col("n_current"), col("n_baseline"),
      when(defined, expected)
        .otherwise(lit(null).cast("double")).as("expected"),
      when(defined,
        (col("n_current").cast("double") - expected)
          * (col("n_current").cast("double") - expected) / expected)
        .otherwise(lit(null).cast("double")).as("chi2_contribution"),
      (col("n_baseline") === 0).as("new_category"))
  }
}
