package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark's Dataset API lacks as primitives,
  * composed per the preference order (SURVEY.md guidance: compose
  * built-ins before reaching for custom plans).
  *
  * Both are single-shuffle compositions: as-of join via the
  * sort-based union trick (never the quadratic
  * `l.ts >= r.ts` theta-join), sessionization via lag + running sum.
  */
object Temporal {

  /** As-of (backward) join: for each left row, attach the latest
    * right-side value with `rightTs <= leftTs` for the same key;
    * null when no such row exists.
    *
    * Implementation: tag and union both sides, sort within each key
    * partition by (ts, side) — right rows sort before left rows at
    * equal timestamps, so an exactly-simultaneous snapshot IS visible
    * to the event — and carry the last non-null right value forward
    * with a running `last(ignoreNulls)` window. One shuffle on the
    * key, O(n log n) per key, no row-pair blow-up: the scalable shape
    * at any data size (vs. the naive `l.ts >= r.ts` join, which
    * explodes quadratically per key).
    *
    * Right side must be unique per (key, ts) — pre-aggregate if not
    * (ties would otherwise make "the latest value" nondeterministic).
    *
    * The carried value rides inside a struct with a constant marker
    * field, so "no snapshot yet" (null struct — skipped by the
    * ignoreNulls window) stays distinguishable from "snapshot whose
    * value IS null" (non-null struct, null `_v`) — matching DuckDB
    * ASOF JOIN and pandas merge_asof, which return the matched row's
    * value even when that value is null.
    */
  def asOfJoinBackward(
      left: DataFrame, leftKey: Column, leftTs: Column,
      right: DataFrame, rightKey: Column, rightTs: Column,
      valueCol: Column, valueName: String): DataFrame = {
    val vs = struct(lit(1).as("_m"), valueCol.as("_v"))
    val vsType = right.select(vs).schema.head.dataType
    val l = left.select(
      leftKey.as("_k"), leftTs.as("_ts"), lit(1).as("_side"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("_lrow"),
      lit(null).cast(vsType).as("_vs"))
    val r = right.select(
      rightKey.as("_k"), rightTs.as("_ts"), lit(0).as("_side"),
      lit(null).cast(left.select(struct(left.columns.toIndexedSeq.map(col): _*)).schema.head.dataType).as("_lrow"),
      vs.as("_vs"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_vs"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_lrow.*"), col("_asof").getField("_v").as(valueName))
  }

  /** SCD2 history build: collapse a keyed change stream into
    * slowly-changing-dimension validity intervals — one row per run
    * of consecutive equal `attr` values, with `valid_from` (first
    * observation), `valid_to` (start of the next run, null while
    * current — the half-open convention) and `is_current`. The
    * history-table half of [[graft.operators.Snapshot.latestSnapshot]]:
    * that keeps the latest image, this keeps every version with its
    * validity window.
    *
    * Input must be unique per (key, ts) — ties would make run
    * boundaries nondeterministic (same contract as [[asOfJoinBackward]]'s
    * right side). Null attr values are legal versions: run-change
    * detection is null-safe (a null run closes a non-null run and
    * vice versa), via the same null-struct marker trick as the as-of
    * join, so "no previous row" stays distinguishable from "previous
    * value was null".
    *
    * Scale: one shuffle on the key; both windows (lag to find run
    * starts, lead to close intervals) share the same partitioning
    * and sort, so the second is exchange-free. Per-key state is the
    * key's own history — the shape every SCD2 build has.
    */
  def scd2Intervals(
      df: DataFrame, key: Column, ts: Column, attr: Column): DataFrame = {
    val wO = Window.partitionBy(col("key")).orderBy(col("_ts").asc)
    val vs = struct(lit(1).as("_m"), col("value").as("_v"))
    df.select(key.as("key"), ts.as("_ts"), attr.as("value"))
      .withColumn("_prev", lag(vs, 1).over(wO))
      .filter(col("_prev").isNull || !(col("_prev._v") <=> col("value")))
      .withColumn("valid_from", col("_ts"))
      .withColumn("valid_to", lead(col("_ts"), 1).over(wO))
      .select(col("key"), col("value"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Arrival-continuity check: fixed-width time buckets between the
    * stream's first and last event that received ZERO rows, merged
    * into contiguous gap intervals `[gap_start_us, gap_end_us)` with
    * their bucket count. The "did hour 14 of the feed ever land?"
    * check — the reference's freshness query (max-date vs cutoff,
    * `data_consistency_checks.py:43-77`) sees only the trailing
    * edge; this sees every hole in the middle of the history.
    *
    * Bucket starts are exact long arithmetic (`us - us mod width`) —
    * no double division, which would mis-bucket near boundaries once
    * the bucket width exceeds ~2⁵³/spine-length micros (day-wide
    * buckets are already there).
    *
    * Scale: one partial-aggregated shuffle folds the data to ≤ one
    * row per bucket; everything after runs on the bucket spine,
    * whose size is (time range / width) — bounded by the calendar,
    * not the data, so the single-partition islands window at the end
    * is safe at any input size (10⁵ rows for a decade of hours).
    * Operational hazard: ONE corrupt far-future timestamp stretches
    * the spine to it (`sequence` refuses past ~2³¹ elements) — fence
    * the timestamp column first ([[graft.operators.Checks.quarantine]]
    * with a bounds rule) when the source isn't trusted.
    */
  def arrivalGaps(
      events: DataFrame, ts: Column, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val width = bucketSeconds * 1000000L
    val us = unix_micros(ts)
    val present = events
      .select((us - pmod(us, lit(width))).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("_n"))
    val spine = present
      .agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(width))).as("b"))
    val missing = spine.join(present, Seq("b"), "left_anti")
    // islands of consecutive missing buckets: b - rank*width is
    // constant within a run (the classic gaps-and-islands key)
    val w = Window.orderBy(col("b"))
    missing
      .withColumn("_g", col("b") - row_number().over(w) * lit(width))
      .groupBy(col("_g"))
      .agg(
        min(col("b")).as("gap_start_us"),
        (max(col("b")) + lit(width)).as("gap_end_us"),
        count(lit(1)).as("n_buckets"))
      .drop("_g")
  }

  /** Ordered-funnel analysis: how many keys (users) completed stage
    * 1, then stage 2 STRICTLY AFTER their first stage-1 event, then
    * stage 3 after that, … Each row is (stage, stage_seq, n_keys),
    * n_keys monotonically non-increasing — the classic conversion
    * funnel, with the earliest-qualifying-event semantics (a user's
    * stage-k clock starts at their FIRST stage-(k−1)-qualifying
    * moment).
    *
    * Implementation — ONE scan, ONE shuffle, any stage count. The
    * source is first filtered to rows matching ANY stage predicate
    * and projected to (key, ts, is_stage…). Stage-k qualifying times
    * then stack as per-key window minimums: `q_k = min(ts WHERE
    * is_k AND ts > q_{k-1}) OVER (PARTITION BY key)`. Every window
    * shares the same partitioning, so Catalyst plans S chained
    * WindowExec nodes over a SINGLE Exchange (each stage's window
    * reads its predecessor's column in place — no re-shuffle, no
    * re-scan); the per-key collapse that follows is already
    * co-partitioned (no second Exchange), and the final count is a
    * one-row global aggregate exploded back to one row per stage.
    * Strictly-after (`>`) means a single event cannot satisfy two
    * stages at once even if both predicates match it; a NULL
    * predecessor time disqualifies the stage (ts > NULL is NULL), so
    * the recurrence short-circuits exactly like the join fold would.
    *
    * Earlier rounds scanned the source once PER STAGE (the standard
    * SQL funnel shape, and still what the oracle does): at a 100 TB
    * events table an S-stage funnel was S full scans. This shape
    * reads the table once regardless of S.
    */
  def funnel(
      events: DataFrame, key: Column, ts: Column,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage required")
    // duplicate names would collide as _is_<name> working columns and
    // die with an opaque ambiguous-reference error — refuse clearly
    require(stages.map(_._1).distinct.size == stages.size,
      s"duplicate stage names: ${stages.map(_._1).mkString(", ")}")
    val preds = stages.map { case (_, p) => coalesce(p, lit(false)) }
    val base = events
      .filter(preds.reduce(_ || _)) // rows matching no stage can never qualify
      .select(
        (Seq(key.as("_k"), ts.as("_ts")) ++
          stages.zip(preds).map { case ((n, _), p) => p.as(s"_is_$n") }): _*)
    val w = Window.partitionBy(col("_k"))
    val staged = stages.zipWithIndex.foldLeft(base) {
      case (df, ((name, _), idx)) =>
        val qualifies =
          if (idx == 0) col(s"_is_$name")
          else col(s"_is_$name") && col("_ts") > col(s"_q${idx - 1}")
        df.withColumn(s"_q$idx", min(when(qualifies, col("_ts"))).over(w))
    }
    // q_k is constant per key after the windows: collapse to one row
    // per key (co-partitioned — no new shuffle), then count non-null
    // qualifying times per stage in one global one-row aggregate
    val perKey = staged.groupBy(col("_k")).agg(
      min(col("_q0")).as("_q0"),
      stages.indices.drop(1).map(i => min(col(s"_q$i")).as(s"_q$i")): _*)
    val totals = perKey.agg(
      count(col("_q0")).as("_n0"),
      stages.indices.drop(1).map(i => count(col(s"_q$i")).as(s"_n$i")): _*)
    totals
      .select(explode(array(stages.zipWithIndex.map { case ((name, _), i) =>
        struct(
          lit(name).as("stage"),
          lit((i + 1).toLong).as("stage_seq"),
          col(s"_n$i").as("n_keys"))
      }: _*)).as("_s"))
      .select(col("_s.stage"), col("_s.stage_seq"), col("_s.n_keys"))
  }

  /** Cohort retention: keys cohorted by their FIRST activity bucket,
    * then per (cohort, bucket-offset) the count of distinct keys
    * still active — the "week-N retention" triangle. Same exact long
    * bucket arithmetic as [[arrivalGaps]].
    *
    * Scale: activity first collapses to DISTINCT (key, bucket) —
    * one shuffle, everything after runs on ≤ keys × buckets rows;
    * the cohort map is a per-key min folded map-side and joined
    * co-keyed. The offset division is exact (bucket deltas are exact
    * multiples of the width).
    */
  def cohortRetention(
      events: DataFrame, key: Column, ts: Column,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val width = bucketSeconds * 1000000L
    val us = unix_micros(ts)
    val act = events
      .select(key.as("_k"), (us - pmod(us, lit(width))).as("_b"))
      .distinct()
    val cohort = act.groupBy(col("_k")).agg(min(col("_b")).as("_c"))
    act.join(cohort, Seq("_k"))
      .groupBy(
        col("_c").as("cohort_start_us"),
        ((col("_b") - col("_c")) / lit(width)).cast("long").as("offset"))
      .agg(count_distinct(col("_k")).as("n_active"))
  }

  /** First-order transition census of a per-key event-state stream:
    * counts of consecutive (from_state → to_state) pairs — the
    * empirical Markov matrix behavior modeling and synthetic-data QA
    * both start from. One key-partitioned window (lag) + one grouped
    * count; ties are impossible under the unique-(key, ts) input
    * contract shared with [[scd2Intervals]].
    */
  def transitionCounts(
      events: DataFrame, key: Column, ts: Column, state: Column): DataFrame = {
    val w = Window.partitionBy(col("_k")).orderBy(col("_ts").asc)
    events
      .select(key.as("_k"), ts.as("_ts"), state.as("_s"))
      .withColumn("_prev", lag(col("_s"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_state"), col("_s").as("to_state"))
      .agg(count(lit(1)).as("n"))
  }

  /** Rolling time-window totals per key: bucket each event into a
    * fixed-width time bucket (same exact long arithmetic as
    * [[arrivalGaps]]), collapse to per-(key, bucket) totals, then
    * attach a trailing `windowBuckets`-wide rolling count and weight
    * sum — the "7-day moving volume per source" series every
    * freshness/drift dashboard plots next to the raw dailies.
    *
    * The scale decision is the ORDER of operations: aggregate FIRST,
    * window SECOND. The range-frame window runs over ≤ keys ×
    * buckets rows (calendar-bounded, like the [[arrivalGaps]]
    * spine), never over raw events — a direct `RANGE BETWEEN`
    * window over a 100 TB event table would sort and frame-scan
    * every row. The pre-aggregate is one partial-combined shuffle;
    * the window re-shuffles only the collapsed series. Buckets with
    * zero events are absent from the series, and the RANGE frame
    * (not ROWS) is what keeps the rolling sum honest across those
    * holes: the frame is bounded by bucket-time distance, so a
    * missing day simply contributes nothing instead of letting the
    * frame slide further back.
    *
    * `weight` is summed as a long (callers quantize doubles first —
    * integer sums are order-insensitive, so results are stable
    * across partitionings and engines; a raw double rolling sum
    * would not be).
    */
  def rollingBucketTotals(
      events: DataFrame, key: Column, ts: Column, weight: Column,
      bucketSeconds: Long, windowBuckets: Int): DataFrame = {
    require(windowBuckets >= 1, s"windowBuckets must be >= 1, got $windowBuckets")
    val width = bucketSeconds * 1000000L
    // the per-(key, bucket) collapse IS the incremental partials
    // contract — one definition of the bucket arithmetic, shared
    val daily = Incremental.bucketPartials(events, key, ts, weight, bucketSeconds)
    val frame = Window.partitionBy(col("key"))
      .orderBy(col("bucket_start_us").asc)
      .rangeBetween(-width * (windowBuckets - 1L), 0L)
    daily.select(
      col("key"), col("bucket_start_us"), col("n"), col("w_sum"),
      sum(col("n")).over(frame).as("n_roll"),
      sum(col("w_sum")).over(frame).as("w_sum_roll"))
  }

  /** Period-over-period activity churn: per key, whether it was
    * active in a prior period, a current period, or both — the
    * new / retained / churned census behind every "are we losing
    * sources/users?" review. Pass the two periods as boolean
    * predicates over the event row (time cuts, usually); a key
    * appears iff it matched at least one.
    *
    * ONE scan, ONE shuffle: both flags fold as conditional `max`es
    * in the same grouped aggregate (partial-combined map-side), so
    * the two-period compare never becomes two scans + a full outer
    * join — the standard SQL shape, and exactly what stops scaling
    * first at a 100 TB events table.
    */
  def activityChurn(
      events: DataFrame, key: Column,
      priorPred: Column, currentPred: Column): DataFrame = {
    val flag = (p: Column) =>
      coalesce(max(when(coalesce(p, lit(false)), 1L).otherwise(0L)), lit(0L)) === 1L
    events
      .filter(coalesce(priorPred, lit(false)) || coalesce(currentPred, lit(false)))
      .groupBy(key.as("key"))
      .agg(
        flag(priorPred).as("in_prior"),
        flag(currentPred).as("in_current"))
      .withColumn("status",
        when(col("in_prior") && col("in_current"), lit("retained"))
          .when(col("in_prior"), lit("churned"))
          .otherwise(lit("new")))
  }

  /** Gap-based sessionization: events more than `gap` apart start a
    * new session. lag + running sum of session-start flags per key —
    * one shuffle on the key. Returns per-session aggregates.
    */
  def sessionize(
      events: DataFrame, key: Column, ts: Column,
      gapSeconds: Long): DataFrame = {
    val wOrder = Window.partitionBy(key).orderBy(ts.asc)
    val prevTs = lag(ts, 1).over(wOrder)
    val isStart = when(
      prevTs.isNull || unix_micros(ts) - unix_micros(prevTs) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    val wRun = Window.partitionBy(key).orderBy(ts.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_session", sum(isStart).over(wRun))
      .groupBy(key.as("key"), col("_session"))
      .agg(
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("key"), col("_session").cast("long").as("session_seq"),
        col("session_start"), col("session_end"), col("n_events"))
  }
}
