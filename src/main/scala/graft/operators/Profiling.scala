package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Column profiling: the "describe every column" DQ primitive (the
  * reference's per-table census generalized to per-column statistics;
  * cf. `pre_and_post_etl_checks.py`'s row-count/max-date census and
  * Deequ-style profilers).
  *
  * ONE scan computes every metric for every requested column — the
  * per-column work rides in a single wide aggregate rather than a
  * job per column, so profiling 50 columns costs one pass over the
  * data plus an expand for the distinct counts. Per column:
  * non-null count, null count, exact distinct count, min, max, mean,
  * sample stddev.
  *
  * Mean and stddev are derived from EXACT decimal sums (values cast
  * to DECIMAL(18,2) — exact for currency/quantity-style data), with
  * the final formula evaluated in double from those exact sums:
  * deterministic regardless of partitioning and engine (a plain
  * double sum's value depends on partition order, which would make
  * the result both nondeterministic and oracle-unmatchable).
  * stddev = sqrt((Σx² − (Σx)²/n) / (n−1)) — the two-pass-free form;
  * Σx² in DECIMAL(38,4) overflows only past 10³⁴.
  */
object Profiling {

  /** Long-format profile of `cols` (all numeric columns when empty):
    * one row per column — (column, n, n_null, n_distinct, min, max,
    * mean, stddev). `stddev` is null for n < 2, `mean` null for
    * n == 0, matching stddev_samp/avg conventions.
    */
  def profileNumeric(df: DataFrame, cols: Seq[String] = Seq.empty): DataFrame = {
    val target =
      if (cols.nonEmpty) cols
      else df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[NumericType] => f.name
      }.toSeq
    require(target.nonEmpty, "no numeric columns to profile")
    // Two one-row aggregates, not one: Spark plans multiple DISTINCT
    // aggregates via Expand (k+1 row copies), and every copy then
    // runs EVERY aggregate's update path — mixing the 5 plain
    // aggregates per column into the same Aggregate as the distincts
    // measured 3× slower than the two passes combined (5.3 s vs
    // 1.8 s at 600k rows). Scans are columnar and cheap; the expand
    // blow-up is not. The two 1-row results cross-join for free.
    val plainAggs = target.flatMap { c =>
      val d = col(c).cast("decimal(18,2)")
      Seq(
        count(col(c)).as(s"${c}__n"),
        (count(lit(1)) - count(col(c))).as(s"${c}__n_null"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(d).as(s"${c}__sum"),
        sum(d * d).as(s"${c}__sumsq"))
    }
    val distinctAggs = target.map { c =>
      count_distinct(col(c)).as(s"${c}__n_distinct")
    }
    val wide = df.agg(plainAggs.head, plainAggs.tail: _*)
      .crossJoin(df.agg(distinctAggs.head, distinctAggs.tail: _*))
    // one row in, |cols| rows out: explode an array of per-column
    // structs built from the wide aggregate (driver-free, plan-side)
    val entries = array(target.map { c =>
      val n = col(s"${c}__n").cast("double")
      val s = col(s"${c}__sum").cast("double")
      val sq = col(s"${c}__sumsq").cast("double")
      struct(
        lit(c).as("column"),
        col(s"${c}__n").as("n"),
        col(s"${c}__n_null").as("n_null"),
        col(s"${c}__n_distinct").as("n_distinct"),
        col(s"${c}__min").as("min"),
        col(s"${c}__max").as("max"),
        when(col(s"${c}__n") > 0, s / n).as("mean"),
        when(col(s"${c}__n") > 1,
          sqrt((sq - s * s / n) / (n - lit(1.0)))).as("stddev"))
    }: _*)
    wide.select(explode(entries).as("p")).select(col("p.*"))
  }
}
