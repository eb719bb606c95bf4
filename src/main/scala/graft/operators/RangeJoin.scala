package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cross product.
  *
  * Spark plans a bare `points JOIN intervals ON start <= p AND
  * p <= end` as BroadcastNestedLoopJoin — every point tested against
  * every interval, O(|P|·|I|), the classic scale-killer. The banding
  * trick turns it into an equi-join: every interval explodes to the
  * fixed-width BINS it overlaps, every point computes its single bin,
  * the join runs on the bin key (shuffle or broadcast hash — the
  * planner's choice), and the exact range predicate filters the
  * within-bin candidates. Each (point, interval) match lands in
  * exactly one joined row — the point's bin is unique and the
  * interval covers it once — so no post-dedup is needed.
  *
  * Cost: |I| · (avg interval length / binWidth) replicated interval
  * rows + per-bin candidate pairs. Pick `binWidth` near the median
  * interval length: much smaller replicates long intervals across
  * many bins; much larger degrades toward all-pairs within a bin.
  * Degenerate inputs (an interval spanning the whole domain) replicate
  * per overlapped bin — cap via `maxBinsPerInterval`, which fails
  * loudly rather than silently exploding.
  */
object RangeJoin {

  /** Join `points` (value column `pt`, a LONG — e.g. unix micros) to
    * `intervals` (`start`/`end` LONG columns, inclusive ends) on
    * start ≤ pt ≤ end. All other columns from both sides ride along.
    */
  def pointInInterval(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long, maxBinsPerInterval: Long = 1 << 20): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // loud guard on degenerate intervals (1-row agg, config-sized)
    val worst = intervals.agg(
      max((col(endCol) - col(startCol)) / binWidth).as("_maxBins")).head()
    val maxBins = Option(worst.get(0)).map(_.toString.toDouble.toLong).getOrElse(0L)
    require(maxBins <= maxBinsPerInterval,
      s"an interval spans $maxBins bins (> $maxBinsPerInterval): raise binWidth " +
        "or split the interval — silent bin explosion refused")
    val binned = intervals.withColumn("_bin",
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    val pts = points.withColumn("_bin",
      floor(col(ptCol) / binWidth).cast("long"))
    pts.join(binned, "_bin")
      .filter(col(startCol) <= col(ptCol) && col(ptCol) <= col(endCol))
      .drop("_bin")
  }
}
