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
    *
    * The explosion guard runs IN the plan (`raise_error` on the
    * offending interval row), not as an eager pre-scan: no second job
    * over the intervals, streaming inputs stay legal, and the failure
    * message names the violating span. Inverted intervals
    * (end < start) fail the same way instead of silently generating
    * descending bin sequences. Bin counts are compared in DOUBLE so a
    * domain-spanning interval can't wrap Long arithmetic past the
    * guard.
    */
  def pointInInterval(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long, maxBinsPerInterval: Long = 1 << 20): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bin = "_graft_rj_bin" // collision-safe vs user columns named _bin
    require(!points.columns.contains(bin) && !intervals.columns.contains(bin),
      s"inputs must not carry a $bin column")
    val lo = floor(col(startCol) / binWidth).cast("long")
    val hi = floor(col(endCol) / binWidth).cast("long")
    // double-precision span check: overflow-free for any Long inputs
    val nBins = (col(endCol).cast("double") / binWidth) -
      (col(startCol).cast("double") / binWidth) + lit(1.0)
    val guarded = when(
      col(endCol) >= col(startCol) && nBins <= lit(maxBinsPerInterval.toDouble),
      sequence(lo, hi))
      .otherwise(raise_error(concat(
        lit(s"interval [" ), col(startCol), lit(", "), col(endCol),
        lit(s"] is inverted or spans more than $maxBinsPerInterval bins of " +
          s"$binWidth: raise binWidth or split the interval — " +
          "silent bin explosion refused"))))
    val binned = intervals.withColumn(bin, explode(guarded))
    val pts = points.withColumn(bin, floor(col(ptCol) / binWidth).cast("long"))
    pts.join(binned, bin)
      .filter(col(startCol) <= col(ptCol) && col(ptCol) <= col(endCol))
      .drop(bin)
  }
}
