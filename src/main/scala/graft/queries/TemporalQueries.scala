package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Association, Temporal}

/** Temporal-operator queries: as-of join (DuckDB has a native ASOF
  * JOIN — a rare chance to oracle-check a composed operator Spark
  * lacks) and gap sessionization.
  */
object TemporalQueries {

  // ---------------------------------------------------------------
  // q33 — as-of join: attach each purchase's latest at-or-before
  // signup value per user (the "latest profile snapshot" pattern).
  // ---------------------------------------------------------------
  def q33AsofJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    // unique per (user, ts): as-of right sides must be tie-free
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .agg(max(col("value")).as("profile_value"))
    Temporal.asOfJoinBackward(
        purchases, col("user_id"), col("ts"),
        signups, col("s_user"), col("s_ts"),
        col("profile_value"), "profile_value")
      .select(col("event_id"), col("user_id"), col("profile_value"))
  }

  val q33Sql: String =
    """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |r AS (SELECT user_id AS s_user, ts AS s_ts, MAX(value) AS profile_value
      |      FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
      |SELECT l.event_id, l.user_id, r.profile_value
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.s_user AND l.ts >= r.s_ts""".stripMargin

  // ---------------------------------------------------------------
  // q34 — gap sessionization: 1-hour-gap sessions per user.
  // Session bounds emitted as epoch micros (engine-portable ints).
  // ---------------------------------------------------------------
  def q34Sessions(spark: SparkSession, d: String): DataFrame =
    Temporal.sessionize(Tables.events(spark, d), col("user_id"), col("ts"),
        gapSeconds = 3600)
      .select(
        col("key").as("user_id"), col("session_seq"),
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"),
        col("n_events"))

  val q34Sql: String =
    """WITH m AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS st
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT user_id, ts,
      |    SUM(st) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM m)
      |SELECT user_id, CAST(sess AS BIGINT) AS session_seq,
      |  epoch_us(MIN(ts)) AS session_start_us,
      |  epoch_us(MAX(ts)) AS session_end_us,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM s GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // q78 — arrival-continuity gaps: hours inside the error stream's
  // own [first, last] range that received zero error events, merged
  // into contiguous gap intervals. Bucket starts are exact epoch-
  // micros arithmetic on both engines, so interval bounds hash-match.
  // ---------------------------------------------------------------
  private val GapBucketSeconds = 3600L

  def q78ArrivalGaps(spark: SparkSession, d: String): DataFrame =
    Temporal.arrivalGaps(
      Tables.events(spark, d).filter(col("event_type") === "error"),
      col("ts"), GapBucketSeconds)

  val q78Sql: String = {
    val w = GapBucketSeconds * 1000000L
    s"""WITH e AS (
       |  SELECT epoch_us(ts) - ((epoch_us(ts) % $w + $w) % $w) AS b
       |  FROM events WHERE event_type = 'error'),
       |p AS (SELECT DISTINCT b FROM e),
       |bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM p),
       |spine AS (SELECT unnest(range(lo, hi + 1, $w)) AS b FROM bounds),
       |m AS (SELECT spine.b FROM spine ANTI JOIN p USING (b)),
       |g AS (SELECT b, b - row_number() OVER (ORDER BY b) * $w AS grp FROM m)
       |SELECT CAST(min(b) AS BIGINT) AS gap_start_us,
       |       CAST(max(b) + $w AS BIGINT) AS gap_end_us,
       |       CAST(count(*) AS BIGINT) AS n_buckets
       |FROM g GROUP BY grp""".stripMargin
  }

  // ---------------------------------------------------------------
  // q80 — SCD2 history: each user's event_type stream collapsed into
  // validity intervals (one row per run of equal values, half-open
  // [valid_from, valid_to), current row open-ended). Bounds as epoch
  // micros; (user_id, ts) is unique in the corpus even after DuckDB's
  // ns → Spark's µs truncation, so run boundaries agree exactly.
  // ---------------------------------------------------------------
  def q80Scd2(spark: SparkSession, d: String): DataFrame =
    Temporal.scd2Intervals(
        Tables.events(spark, d), col("user_id"), col("ts"), col("event_type"))
      .select(
        col("key").as("user_id"), col("value").as("event_type"),
        unix_micros(col("valid_from")).as("valid_from_us"),
        unix_micros(col("valid_to")).as("valid_to_us"),
        col("is_current"))

  // Boundary test is null-SAFE (`IS DISTINCT FROM` + explicit
  // first-row marker), matching scd2Intervals' `<=>`-based run
  // detection: a NULL event_type run neither merges with its
  // neighbors nor drops the partition's first row. The corpus has no
  // NULL event_type today, but the oracle must pin the same
  // null-version semantics the operator implements, not a weaker
  // variant that happens to agree on this corpus.
  val q80Sql: String =
    """WITH o AS (
      |  SELECT user_id, event_type, ts,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      |  FROM events),
      |ch AS (
      |  SELECT user_id, event_type, ts FROM o
      |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
      |SELECT user_id, event_type, epoch_us(ts) AS valid_from_us,
      |  epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS valid_to_us,
      |  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL) AS is_current
      |FROM ch""".stripMargin

  // ---------------------------------------------------------------
  // q86 — ordered conversion funnel: first view → a >90-value click
  // strictly after it → a >95-value purchase strictly after that.
  // 150 → 131 → 86 users at sf0.01 — a genuinely narrowing funnel.
  // Timestamp comparisons agree across engines because (user_id, ts)
  // stays unique after the ns → µs truncation (the q80 argument).
  // ---------------------------------------------------------------
  def q86Funnel(spark: SparkSession, d: String): DataFrame =
    Temporal.funnel(Tables.events(spark, d), col("user_id"), col("ts"), Seq(
      "view" -> (col("event_type") === "view"),
      "click" -> (col("event_type") === "click" && col("value") > 90),
      "purchase" -> (col("event_type") === "purchase" && col("value") > 95)))

  val q86Sql: String =
    """WITH s1 AS (
      |  SELECT user_id AS k, min(ts) AS q FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id AS k, min(e.ts) AS q
      |  FROM events e JOIN s1 ON e.user_id = s1.k AND e.ts > s1.q
      |  WHERE e.event_type = 'click' AND e.value > 90 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id AS k, min(e.ts) AS q
      |  FROM events e JOIN s2 ON e.user_id = s2.k AND e.ts > s2.q
      |  WHERE e.event_type = 'purchase' AND e.value > 95 GROUP BY 1)
      |SELECT 'view' AS stage, CAST(1 AS BIGINT) AS stage_seq,
      |  CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_keys
      |UNION ALL SELECT 'click', CAST(2 AS BIGINT),
      |  CAST((SELECT count(*) FROM s2) AS BIGINT)
      |UNION ALL SELECT 'purchase', CAST(3 AS BIGINT),
      |  CAST((SELECT count(*) FROM s3) AS BIGINT)""".stripMargin

  // ---------------------------------------------------------------
  // q87 — weekly cohort retention over high-value activity
  // (value > 200): users cohorted by first qualifying week, distinct
  // actives per (cohort, week offset). The rarity filter is what
  // makes the triangle non-degenerate on this dense corpus.
  // ---------------------------------------------------------------
  private val CohortWeekSeconds = 7L * 86400L
  private val CohortValueMin = 200

  def q87CohortRetention(spark: SparkSession, d: String): DataFrame =
    Temporal.cohortRetention(
      Tables.events(spark, d).filter(col("value") > CohortValueMin),
      col("user_id"), col("ts"), CohortWeekSeconds)

  val q87Sql: String = {
    val w = CohortWeekSeconds * 1000000L
    s"""WITH act AS (
       |  SELECT DISTINCT user_id AS k, epoch_us(ts) - ((epoch_us(ts) % $w + $w) % $w) AS b
       |  FROM events WHERE value > $CohortValueMin),
       |coh AS (SELECT k, min(b) AS c FROM act GROUP BY 1)
       |SELECT c AS cohort_start_us, CAST((b - c) / $w AS BIGINT) AS offset,
       |  CAST(count(DISTINCT k) AS BIGINT) AS n_active
       |FROM act JOIN coh USING (k) GROUP BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------
  // q88 — empirical transition matrix: consecutive event-type pairs
  // per user (the first-order Markov census). Unique (user, ts)
  // keeps the lag deterministic on both engines.
  // ---------------------------------------------------------------
  def q88Transitions(spark: SparkSession, d: String): DataFrame =
    Temporal.transitionCounts(
      Tables.events(spark, d), col("user_id"), col("ts"), col("event_type"))

  val q88Sql: String =
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM events)
      |SELECT prev AS from_state, event_type AS to_state,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM o WHERE prev IS NOT NULL GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // q100 — 7-day rolling daily volume per event type: daily counts
  // and cent-quantized value totals with a trailing one-week RANGE
  // window. Weights are quantized half-even to integer cents BEFORE
  // summing (integer sums are order-insensitive — the only way a
  // rolling "sum of doubles" can hash-match across engines).
  // ---------------------------------------------------------------
  private val DaySeconds = 86400L
  private val DayUs = DaySeconds * 1000000L
  private val RollDays = 7

  def q100RollingDaily(spark: SparkSession, d: String): DataFrame =
    Temporal.rollingBucketTotals(
      Tables.events(spark, d), col("event_type"), col("ts"),
      bround(col("value") * 100).cast("long"), DaySeconds, RollDays)

  val q100Sql: String =
    s"""WITH dly AS (
       |  SELECT event_type AS key,
       |    epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS bucket_start_us,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(round_even(value * 100, 0) AS BIGINT)) AS BIGINT) AS w_sum
       |  FROM events GROUP BY 1, 2)
       |SELECT key, bucket_start_us, n, w_sum,
       |  CAST(sum(n) OVER w AS BIGINT) AS n_roll,
       |  CAST(sum(w_sum) OVER w AS BIGINT) AS w_sum_roll
       |FROM dly
       |WINDOW w AS (PARTITION BY key ORDER BY bucket_start_us
       |  RANGE BETWEEN ${DayUs * (RollDays - 1)} PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------
  // q103 — purchase-activity churn across the corpus's two
  // half-months: per user, active-in-prior vs active-in-current →
  // new / retained / churned. Cutoff pinned as epoch micros (the
  // fixed-literal NOW convention, tz-proof on both engines).
  // ---------------------------------------------------------------
  private val ChurnCutoffUs = 1705363200000000L // 2024-01-16T00:00:00Z

  def q103Churn(spark: SparkSession, d: String): DataFrame = {
    val purchase = col("event_type") === "purchase"
    Temporal.activityChurn(
      Tables.events(spark, d), col("user_id"),
      purchase && unix_micros(col("ts")) < ChurnCutoffUs,
      purchase && unix_micros(col("ts")) >= ChurnCutoffUs)
  }

  val q103Sql: String =
    s"""WITH f AS (
       |  SELECT user_id AS key,
       |    max(CASE WHEN epoch_us(ts) < $ChurnCutoffUs THEN 1 ELSE 0 END) AS p,
       |    max(CASE WHEN epoch_us(ts) >= $ChurnCutoffUs THEN 1 ELSE 0 END) AS c
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
       |SELECT key, p = 1 AS in_prior, c = 1 AS in_current,
       |  CASE WHEN p = 1 AND c = 1 THEN 'retained'
       |       WHEN p = 1 THEN 'churned' ELSE 'new' END AS status
       |FROM f""".stripMargin

  // ---------------------------------------------------------------
  // q104 — event-type co-occurrence within user-days: which types
  // travel together in the same user's same day (support ≥ 5
  // user-days). The A-Priori pair-support census on a
  // calendar-bounded group key.
  // ---------------------------------------------------------------
  private val CoPairMinSupport = 5L

  def q104CoPairs(spark: SparkSession, d: String): DataFrame = {
    val us = unix_micros(col("ts"))
    // user_id fenced on BOTH sides: the struct group key compares its
    // fields null-safe in Spark's join while the oracle's
    // `a.user_id = b.user_id` is null-rejecting — a NULL user would
    // silently diverge engine vs oracle (Association scaladoc).
    Association.coOccurrencePairs(
      Tables.events(spark, d).filter(col("user_id").isNotNull),
      struct(col("user_id"), (us - pmod(us, lit(DayUs))).as("d")),
      col("event_type"), CoPairMinSupport)
  }

  val q104Sql: String =
    s"""WITH gi AS (
       |  SELECT DISTINCT user_id,
       |    epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS d, event_type AS i
       |  FROM events WHERE user_id IS NOT NULL),
       |p AS (
       |  SELECT a.i AS item_a, b.i AS item_b
       |  FROM gi a JOIN gi b ON a.user_id = b.user_id AND a.d = b.d AND a.i < b.i)
       |SELECT item_a, item_b, CAST(count(*) AS BIGINT) AS n_groups
       |FROM p GROUP BY 1, 2 HAVING count(*) >= $CoPairMinSupport""".stripMargin

  // ---------------------------------------------------------------
  // q114 — association strength over the q104 pair census: lift and
  // both conditional confidences from exact integer marginals. Every
  // score is ONE correctly-rounded double op over integers (products
  // stay below 2^53), so it hash-matches cross-engine — the reason
  // there is deliberately no log-PMI column.
  // ---------------------------------------------------------------
  def q114PairLift(spark: SparkSession, d: String): DataFrame = {
    val us = unix_micros(col("ts"))
    Association.pairLift(
      Tables.events(spark, d).filter(col("user_id").isNotNull),
      struct(col("user_id"), (us - pmod(us, lit(DayUs))).as("d")),
      col("event_type"), CoPairMinSupport)
  }

  val q114Sql: String =
    s"""WITH gi AS (
       |  SELECT DISTINCT user_id,
       |    epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS d, event_type AS i
       |  FROM events WHERE user_id IS NOT NULL),
       |pairs AS (
       |  SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS n_groups
       |  FROM gi a JOIN gi b ON a.user_id = b.user_id AND a.d = b.d AND a.i < b.i
       |  GROUP BY 1, 2 HAVING count(*) >= $CoPairMinSupport),
       |marg AS (SELECT i, CAST(count(*) AS BIGINT) AS n_i FROM gi GROUP BY 1),
       |tot AS (SELECT CAST(count(DISTINCT (user_id, d)) AS BIGINT) AS n_total FROM gi)
       |SELECT item_a, item_b, n_groups, ma.n_i AS n_a, mb.n_i AS n_b, n_total,
       |  CAST(n_groups * n_total AS DOUBLE) / CAST(ma.n_i * mb.n_i AS DOUBLE) AS lift,
       |  CAST(n_groups AS DOUBLE) / CAST(ma.n_i AS DOUBLE) AS conf_a_b,
       |  CAST(n_groups AS DOUBLE) / CAST(mb.n_i AS DOUBLE) AS conf_b_a
       |FROM pairs JOIN marg ma ON pairs.item_a = ma.i
       |JOIN marg mb ON pairs.item_b = mb.i CROSS JOIN tot""".stripMargin

  // ---------------------------------------------------------------
  // q149 — KS drift timeline: exact two-sample KS between every pair
  // of adjacent DAYS of the events stream on `value` — the
  // distribution-level companion to q83/q90's volume monitors, one
  // row per day step. Buckets use the q100 long arithmetic so the
  // timeline aligns with the rolling/seasonal series; the oracle
  // replays the pair-union census with naive windows per pair.
  // ---------------------------------------------------------------
  def q149KsTimeline(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.ksAdjacentPeriods(
      Tables.events(spark, d), col("ts"), col("value"), DaySeconds)

  val q149Sql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS b, CAST(value AS DOUBLE) AS v
       |  FROM events
       |  WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))),
       |c AS (SELECT b, v, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY b, v),
       |bk AS (SELECT DISTINCT b FROM c),
       |vp AS (SELECT b1.b AS p FROM bk b1 JOIN bk b2 ON b2.b = b1.b + $DayUs),
       |u AS (
       |  SELECT b AS p, v, n AS nl, CAST(0 AS BIGINT) AS nr FROM c
       |  UNION ALL
       |  SELECT b - $DayUs AS p, v, CAST(0 AS BIGINT) AS nl, n AS nr FROM c),
       |pc AS (
       |  SELECT u.p, u.v, CAST(SUM(nl) AS BIGINT) AS nl, CAST(SUM(nr) AS BIGINT) AS nr
       |  FROM u JOIN vp ON u.p = vp.p GROUP BY u.p, u.v),
       |t AS (SELECT p, CAST(SUM(nl) AS BIGINT) AS tl, CAST(SUM(nr) AS BIGINT) AS tr,
       |        CAST(COUNT(*) AS BIGINT) AS nd FROM pc GROUP BY p),
       |w AS (
       |  SELECT p, v,
       |    CAST(SUM(nl) OVER (PARTITION BY p ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cl,
       |    CAST(SUM(nr) OVER (PARTITION BY p ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cr
       |  FROM pc),
       |g AS (
       |  SELECT w.p, w.v,
       |    ABS(CAST(w.cl AS DOUBLE) / CAST(t.tl AS DOUBLE)
       |      - CAST(w.cr AS DOUBLE) / CAST(t.tr AS DOUBLE)) AS gap
       |  FROM w JOIN t ON w.p = t.p),
       |m AS (SELECT p, MAX(gap) AS mx FROM g GROUP BY p)
       |SELECT t.p AS bucket_start_us, t.p + $DayUs AS next_start_us,
       |  t.tl AS n_left, t.tr AS n_right, t.nd AS n_distinct_values,
       |  m.mx AS ks_stat,
       |  (SELECT MIN(v) FROM g WHERE g.p = m.p AND g.gap = m.mx) AS ks_at,
       |  SQRT(CAST(t.tl AS DOUBLE) * CAST(t.tr AS DOUBLE)
       |    / CAST(t.tl + t.tr AS DOUBLE)) * m.mx AS ks_z
       |FROM m JOIN t ON m.p = t.p""".stripMargin

  // ---------------------------------------------------------------
  // q150 — categorical drift timeline: the 2×k chi-square drift of
  // the event-type mix between every pair of adjacent days — q149's
  // companion for categorical columns (and the timeline form of
  // q52's two-cohort categorical drift). Per (pair, type) cell:
  // counts, rates, rate gap, two-sided chi-square contribution
  // against the pooled expectation; Σ per pair = χ² with k−1 dof.
  // ---------------------------------------------------------------
  def q150CatTimeline(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.categoricalDriftTimeline(
      Tables.events(spark, d), col("ts"), col("event_type"), DaySeconds)

  val q150Sql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS b, event_type AS k
       |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
       |c AS (SELECT b, k, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY b, k),
       |bk AS (SELECT DISTINCT b FROM c),
       |vp AS (SELECT b1.b AS p FROM bk b1 JOIN bk b2 ON b2.b = b1.b + $DayUs),
       |u AS (
       |  SELECT b AS p, k, n AS nl, CAST(0 AS BIGINT) AS nr FROM c
       |  UNION ALL
       |  SELECT b - $DayUs AS p, k, CAST(0 AS BIGINT) AS nl, n AS nr FROM c),
       |pc AS (
       |  SELECT u.p, u.k, CAST(SUM(nl) AS BIGINT) AS nl, CAST(SUM(nr) AS BIGINT) AS nr
       |  FROM u JOIN vp ON u.p = vp.p GROUP BY u.p, u.k),
       |t AS (SELECT p, CAST(SUM(nl) AS BIGINT) AS tl, CAST(SUM(nr) AS BIGINT) AS tr
       |      FROM pc GROUP BY p),
       |j AS (
       |  SELECT pc.p, pc.k, pc.nl, pc.nr, t.tl, t.tr,
       |    CAST(t.tl AS DOUBLE) * CAST(pc.nl + pc.nr AS DOUBLE)
       |      / CAST(t.tl + t.tr AS DOUBLE) AS el,
       |    CAST(t.tr AS DOUBLE) * CAST(pc.nl + pc.nr AS DOUBLE)
       |      / CAST(t.tl + t.tr AS DOUBLE) AS er
       |  FROM pc JOIN t ON pc.p = t.p)
       |SELECT p AS bucket_start_us, p + $DayUs AS next_start_us, k AS key,
       |  nl AS n_left, nr AS n_right, tl AS left_total, tr AS right_total,
       |  CAST(nl AS DOUBLE) / CAST(tl AS DOUBLE) AS rate_left,
       |  CAST(nr AS DOUBLE) / CAST(tr AS DOUBLE) AS rate_right,
       |  CAST(nl AS DOUBLE) / CAST(tl AS DOUBLE)
       |    - CAST(nr AS DOUBLE) / CAST(tr AS DOUBLE) AS rate_gap,
       |  (CAST(nl AS DOUBLE) - el) * (CAST(nl AS DOUBLE) - el) / el
       |    + (CAST(nr AS DOUBLE) - er) * (CAST(nr AS DOUBLE) - er) / er
       |    AS chi2_contribution
       |FROM j""".stripMargin

  // ---------------------------------------------------------------
  // q153 — CUSUM change-point census over daily event volume: the
  // cumulative deviation from the all-period mean rate, per day,
  // with the peak |CUSUM| day flagged — catches persistent small
  // level shifts the per-day volume monitors (q83/q90) cannot see.
  // Integer-exact via the D-scaled form (D·cum_k − k·N).
  // ---------------------------------------------------------------
  def q153Cusum(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.cusumChangePoint(
      Tables.events(spark, d), col("ts"), DaySeconds)

  val q153Sql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS b
       |  FROM events WHERE ts IS NOT NULL),
       |c AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY b),
       |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS d, CAST(SUM(n) AS BIGINT) AS nn
       |      FROM c),
       |w AS (SELECT b, n,
       |    CAST(SUM(n) OVER (ORDER BY b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
       |    CAST(ROW_NUMBER() OVER (ORDER BY b) AS BIGINT) AS k
       |  FROM c),
       |sc AS (SELECT w.b, w.n, w.cum_n, t.d,
       |    CAST(CAST(t.d AS HUGEINT) * w.cum_n
       |      - CAST(w.k AS HUGEINT) * t.nn AS DECIMAL(38,0)) AS scaled
       |  FROM w CROSS JOIN t),
       |m AS (SELECT MAX(ABS(scaled)) AS mx FROM sc),
       |p AS (SELECT MIN(b) AS pb FROM sc CROSS JOIN m WHERE ABS(scaled) = m.mx)
       |SELECT sc.b AS bucket_start_us, sc.n, sc.cum_n,
       |  CAST(sc.scaled AS DOUBLE) AS cusum_scaled,
       |  CAST(sc.scaled AS DOUBLE) / CAST(sc.d AS DOUBLE) AS cusum,
       |  sc.b = p.pb AS is_peak
       |FROM sc CROSS JOIN p""".stripMargin

  // ---------------------------------------------------------------
  // q177 — Theil–Sen robust trend of daily event volume: the median
  // of all pairwise day-slopes over the ZERO-FILLED calendar spine
  // (an empty day is a 0 in a volume trend, not a gap) — the robust
  // companion to q153's CUSUM (CUSUM localizes a level shift; this
  // estimates the drift rate a single outage day cannot wreck).
  // Exact pair slopes (integer-double divisions), exact interpolated
  // median (percentile == quantile_cont, the q39 convention).
  // ---------------------------------------------------------------
  def q177TheilSen(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.theilSenTrend(
      Tables.events(spark, d), col("ts"), DaySeconds)

  val q177Sql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS b
       |  FROM events WHERE ts IS NOT NULL),
       |c AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY b),
       |bd AS (SELECT MIN(b) AS mn, MAX(b) AS mx FROM c),
       |spine AS (SELECT CAST(bd.mn + gs.x * $DayUs AS BIGINT) AS b
       |  FROM bd, generate_series(0, 100000) gs(x)
       |  WHERE bd.mn + gs.x * $DayUs <= bd.mx),
       |series AS (
       |  SELECT spine.b, COALESCE(c.n, 0) AS n
       |  FROM spine LEFT JOIN c ON spine.b = c.b),
       |slopes AS (
       |  SELECT CAST(r.n - l.n AS DOUBLE)
       |      / (CAST(r.b - l.b AS DOUBLE) / ${DayUs}.0) AS s
       |  FROM series l JOIN series r ON l.b < r.b)
       |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM spine) AS n_buckets,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  quantile_cont(s, 0.5) AS slope_per_bucket,
       |  MIN(s) AS slope_min, MAX(s) AS slope_max
       |FROM slopes""".stripMargin

  // ---------------------------------------------------------------
  // q178 — per-type Theil–Sen trend: which stream is actually
  // growing/shrinking, robustly — q177 keyed by event type over the
  // shared calendar spine (a type absent on a day is a 0 for it).
  // ---------------------------------------------------------------
  def q178GroupTheilSen(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.theilSenTrendBy(
      Tables.events(spark, d), col("event_type"), col("ts"), DaySeconds)
      .withColumnRenamed("key", "event_type")

  val q178Sql: String =
    s"""WITH e AS (
       |  SELECT event_type AS k, epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS b
       |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
       |c AS (SELECT k, b, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY k, b),
       |bd AS (SELECT MIN(b) AS mn, MAX(b) AS mx FROM c),
       |spine AS (SELECT CAST(bd.mn + gs.x * $DayUs AS BIGINT) AS b
       |  FROM bd, generate_series(0, 100000) gs(x)
       |  WHERE bd.mn + gs.x * $DayUs <= bd.mx),
       |series AS (
       |  SELECT ks.k, spine.b, COALESCE(c.n, 0) AS n
       |  FROM (SELECT DISTINCT k FROM c) ks
       |  CROSS JOIN spine
       |  LEFT JOIN c ON c.k = ks.k AND c.b = spine.b),
       |slopes AS (
       |  SELECT l.k, CAST(r.n - l.n AS DOUBLE)
       |      / (CAST(r.b - l.b AS DOUBLE) / ${DayUs}.0) AS s
       |  FROM series l JOIN series r ON l.k = r.k AND l.b < r.b)
       |SELECT k AS event_type,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM spine) AS n_buckets,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  quantile_cont(s, 0.5) AS slope_per_bucket,
       |  MIN(s) AS slope_min, MAX(s) AS slope_max
       |FROM slopes GROUP BY k""".stripMargin

  // ---------------------------------------------------------------
  // q179 — Mann–Kendall trend test of daily event volume: is q177's
  // slope a real monotone trend or noise, at these sample sizes —
  // exact S over the zero-filled spine, tie-corrected variance,
  // continuity-corrected z, p on the shared normal grid.
  // ---------------------------------------------------------------
  def q179MannKendall(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.mannKendallTrend(
      Tables.events(spark, d), col("ts"), DaySeconds)

  val q179Sql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS b
       |  FROM events WHERE ts IS NOT NULL),
       |c AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY b),
       |bd AS (SELECT MIN(b) AS mn, MAX(b) AS mx FROM c),
       |spine AS (SELECT CAST(bd.mn + gs.x * $DayUs AS BIGINT) AS b
       |  FROM bd, generate_series(0, 100000) gs(x)
       |  WHERE bd.mn + gs.x * $DayUs <= bd.mx),
       |series AS (
       |  SELECT spine.b, COALESCE(c.n, 0) AS n
       |  FROM spine LEFT JOIN c ON spine.b = c.b),
       |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM spine),
       |sagg AS (
       |  SELECT COALESCE(CAST(SUM(CASE WHEN r.n > l.n THEN 1
       |      WHEN r.n < l.n THEN -1 ELSE 0 END) AS BIGINT), 0) AS s
       |  FROM series l JOIN series r ON l.b < r.b),
       |tie AS (
       |  SELECT COALESCE(CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
       |    AS HUGEINT), 0) AS vt
       |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM series GROUP BY n) m),
       |f AS (
       |  SELECT nb.nn AS n_buckets, sagg.s AS s_statistic,
       |    CAST(CAST(nb.nn AS HUGEINT) * (nb.nn - 1) * (2 * nb.nn + 5)
       |      - tie.vt AS DOUBLE) / 18.0 AS var_s
       |  FROM nb CROSS JOIN sagg CROSS JOIN tie),
       |g AS (
       |  SELECT *,
       |    CASE WHEN var_s > 0.0 AND s_statistic > 0
       |      THEN (CAST(s_statistic AS DOUBLE) - 1.0) / SQRT(var_s)
       |    WHEN var_s > 0.0 AND s_statistic < 0
       |      THEN (CAST(s_statistic AS DOUBLE) + 1.0) / SQRT(var_s)
       |    WHEN var_s > 0.0 THEN 0.0 END AS z
       |  FROM f)
       |SELECT n_buckets, s_statistic, var_s, z,
       |  ${graft.operators.StatTests.normalPTwoSidedSql("z")} AS p_two_sided
       |FROM g""".stripMargin

  // ---------------------------------------------------------------
  // q180 — per-type Mann–Kendall: which stream's trend is REAL —
  // q179 keyed by event type over the shared spine, per-key ties.
  // ---------------------------------------------------------------
  def q180GroupMannKendall(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.mannKendallTrendBy(
      Tables.events(spark, d), col("event_type"), col("ts"), DaySeconds)
      .withColumnRenamed("key", "event_type")

  val q180Sql: String =
    s"""WITH e AS (
       |  SELECT event_type AS k, epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS b
       |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
       |c AS (SELECT k, b, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY k, b),
       |bd AS (SELECT MIN(b) AS mn, MAX(b) AS mx FROM c),
       |spine AS (SELECT CAST(bd.mn + gs.x * $DayUs AS BIGINT) AS b
       |  FROM bd, generate_series(0, 100000) gs(x)
       |  WHERE bd.mn + gs.x * $DayUs <= bd.mx),
       |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM spine),
       |series AS (
       |  SELECT ks.k, spine.b, COALESCE(c.n, 0) AS n
       |  FROM (SELECT DISTINCT k FROM c) ks
       |  CROSS JOIN spine
       |  LEFT JOIN c ON c.k = ks.k AND c.b = spine.b),
       |sagg AS (
       |  SELECT l.k, COALESCE(CAST(SUM(CASE WHEN r.n > l.n THEN 1
       |      WHEN r.n < l.n THEN -1 ELSE 0 END) AS BIGINT), 0) AS s
       |  FROM series l JOIN series r ON l.k = r.k AND l.b < r.b
       |  GROUP BY l.k),
       |tie AS (
       |  SELECT k, COALESCE(CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
       |    AS HUGEINT), 0) AS vt
       |  FROM (SELECT k, CAST(COUNT(*) AS BIGINT) AS t FROM series GROUP BY k, n) m
       |  GROUP BY k),
       |f AS (
       |  SELECT sagg.k, nb.nn AS n_buckets, sagg.s AS s_statistic,
       |    CAST(CAST(nb.nn AS HUGEINT) * (nb.nn - 1) * (2 * nb.nn + 5)
       |      - tie.vt AS DOUBLE) / 18.0 AS var_s
       |  FROM sagg JOIN tie ON sagg.k = tie.k CROSS JOIN nb),
       |g AS (
       |  SELECT *,
       |    CASE WHEN var_s > 0.0 AND s_statistic > 0
       |      THEN (CAST(s_statistic AS DOUBLE) - 1.0) / SQRT(var_s)
       |    WHEN var_s > 0.0 AND s_statistic < 0
       |      THEN (CAST(s_statistic AS DOUBLE) + 1.0) / SQRT(var_s)
       |    WHEN var_s > 0.0 THEN 0.0 END AS z
       |  FROM f)
       |SELECT k AS event_type, n_buckets, s_statistic, var_s, z,
       |  ${graft.operators.StatTests.normalPTwoSidedSql("z")} AS p_two_sided
       |FROM g""".stripMargin

  // ---------------------------------------------------------------
  // q189 — SEASONAL Mann–Kendall: q179's monotone-trend evidence with
  // the weekday cycle (q90's seasonality) stratified OUT — S summed
  // over same-weekday bucket pairs only (7 bounded pair censuses over
  // the shared spine), tie-corrected variance per stratum. The
  // q178/q180 trend tests are weekday-confounded on a corpus with a
  // weekly cycle; this is the form whose null distribution survives
  // one.
  // ---------------------------------------------------------------
  def q189SeasonalMannKendall(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.seasonalMannKendallTrend(
      Tables.events(spark, d), col("ts"), DaySeconds, seasons = 7)

  val q189Sql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS b
       |  FROM events WHERE ts IS NOT NULL),
       |c AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY b),
       |bd AS (SELECT MIN(b) AS mn, MAX(b) AS mx FROM c),
       |spine AS (SELECT CAST(bd.mn + gs.x * $DayUs AS BIGINT) AS b
       |  FROM bd, generate_series(0, 100000) gs(x)
       |  WHERE bd.mn + gs.x * $DayUs <= bd.mx),
       |series AS (
       |  SELECT spine.b, (((spine.b // $DayUs) % 7) + 7) % 7 AS g, COALESCE(c.n, 0) AS n
       |  FROM spine LEFT JOIN c ON spine.b = c.b),
       |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM spine),
       |sagg AS (
       |  SELECT COALESCE(CAST(SUM(CASE WHEN r.n > l.n THEN 1
       |      WHEN r.n < l.n THEN -1 ELSE 0 END) AS BIGINT), 0) AS s
       |  FROM series l JOIN series r ON l.g = r.g AND l.b < r.b),
       |vg AS (
       |  SELECT g, CAST(SUM(t) AS BIGINT) AS ng,
       |    COALESCE(CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
       |      AS HUGEINT), 0) AS vt
       |  FROM (SELECT g, n, CAST(COUNT(*) AS BIGINT) AS t
       |        FROM series GROUP BY g, n) m
       |  GROUP BY g),
       |vr AS (
       |  SELECT COALESCE(CAST(SUM(CAST(ng AS HUGEINT) * (ng - 1) * (2 * ng + 5)
       |    - vt) AS HUGEINT), 0) AS vnum
       |  FROM vg),
       |f AS (
       |  SELECT nb.nn AS n_buckets, CAST(7 AS BIGINT) AS n_seasons,
       |    sagg.s AS s_statistic,
       |    CAST(vr.vnum AS DOUBLE) / 18.0 AS var_s
       |  FROM nb CROSS JOIN sagg CROSS JOIN vr),
       |g AS (
       |  SELECT *,
       |    CASE WHEN var_s > 0.0 AND s_statistic > 0
       |      THEN (CAST(s_statistic AS DOUBLE) - 1.0) / SQRT(var_s)
       |    WHEN var_s > 0.0 AND s_statistic < 0
       |      THEN (CAST(s_statistic AS DOUBLE) + 1.0) / SQRT(var_s)
       |    WHEN var_s > 0.0 THEN 0.0 END AS z
       |  FROM f)
       |SELECT n_buckets, n_seasons, s_statistic, var_s, z,
       |  ${graft.operators.StatTests.normalPTwoSidedSql("z")} AS p_two_sided
       |FROM g""".stripMargin

  // ---------------------------------------------------------------
  // q191 — per-type SEASONAL Mann–Kendall: q189 keyed by event type
  // over the shared spine — which stream's trend survives weekday
  // deseasonalization (the q180 table with the cycle stratified out).
  // ---------------------------------------------------------------
  def q191GroupSeasonalMannKendall(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.seasonalMannKendallTrendBy(
      Tables.events(spark, d), col("event_type"), col("ts"), DaySeconds,
      seasons = 7)
      .withColumnRenamed("key", "event_type")

  val q191Sql: String =
    s"""WITH e AS (
       |  SELECT event_type AS k, epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS b
       |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
       |c AS (SELECT k, b, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY k, b),
       |bd AS (SELECT MIN(b) AS mn, MAX(b) AS mx FROM c),
       |spine AS (SELECT CAST(bd.mn + gs.x * $DayUs AS BIGINT) AS b
       |  FROM bd, generate_series(0, 100000) gs(x)
       |  WHERE bd.mn + gs.x * $DayUs <= bd.mx),
       |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM spine),
       |series AS (
       |  SELECT ks.k, spine.b, (((spine.b // $DayUs) % 7) + 7) % 7 AS g, COALESCE(c.n, 0) AS n
       |  FROM (SELECT DISTINCT k FROM c) ks
       |  CROSS JOIN spine
       |  LEFT JOIN c ON c.k = ks.k AND c.b = spine.b),
       |sagg AS (
       |  SELECT l.k, COALESCE(CAST(SUM(CASE WHEN r.n > l.n THEN 1
       |      WHEN r.n < l.n THEN -1 ELSE 0 END) AS BIGINT), 0) AS s
       |  FROM series l JOIN series r ON l.k = r.k AND l.g = r.g AND l.b < r.b
       |  GROUP BY l.k),
       |vg AS (
       |  SELECT k, g, CAST(SUM(t) AS BIGINT) AS ng,
       |    COALESCE(CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
       |      AS HUGEINT), 0) AS vt
       |  FROM (SELECT k, g, n, CAST(COUNT(*) AS BIGINT) AS t
       |        FROM series GROUP BY k, g, n) m
       |  GROUP BY k, g),
       |vr AS (
       |  SELECT k, COALESCE(CAST(SUM(CAST(ng AS HUGEINT) * (ng - 1) * (2 * ng + 5)
       |    - vt) AS HUGEINT), 0) AS vnum
       |  FROM vg GROUP BY k),
       |f AS (
       |  SELECT sagg.k, nb.nn AS n_buckets, CAST(7 AS BIGINT) AS n_seasons,
       |    sagg.s AS s_statistic,
       |    CAST(vr.vnum AS DOUBLE) / 18.0 AS var_s
       |  FROM sagg JOIN vr ON sagg.k = vr.k CROSS JOIN nb),
       |g AS (
       |  SELECT *,
       |    CASE WHEN var_s > 0.0 AND s_statistic > 0
       |      THEN (CAST(s_statistic AS DOUBLE) - 1.0) / SQRT(var_s)
       |    WHEN var_s > 0.0 AND s_statistic < 0
       |      THEN (CAST(s_statistic AS DOUBLE) + 1.0) / SQRT(var_s)
       |    WHEN var_s > 0.0 THEN 0.0 END AS z
       |  FROM f)
       |SELECT k AS event_type, n_buckets, n_seasons, s_statistic, var_s, z,
       |  ${graft.operators.StatTests.normalPTwoSidedSql("z")} AS p_two_sided
       |FROM g""".stripMargin

  // ---------------------------------------------------------------
  // q154 — per-type CUSUM change-point census: q153 keyed by
  // event_type, so a level shift in one stream is localized to ITS
  // key and day instead of diluting into the corpus total.
  // ---------------------------------------------------------------
  def q154GroupCusum(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.cusumChangePointBy(
      Tables.events(spark, d), col("ts"), col("event_type"), DaySeconds)

  val q154Sql: String =
    s"""WITH e AS (
       |  SELECT event_type AS k, epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS b
       |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
       |c AS (SELECT k, b, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY k, b),
       |t AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS d, CAST(SUM(n) AS BIGINT) AS nn
       |      FROM c GROUP BY k),
       |w AS (SELECT k, b, n,
       |    CAST(SUM(n) OVER (PARTITION BY k ORDER BY b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY b) AS BIGINT) AS j
       |  FROM c),
       |sc AS (SELECT w.k, w.b, w.n, w.cum_n, t.d,
       |    CAST(CAST(t.d AS HUGEINT) * w.cum_n
       |      - CAST(w.j AS HUGEINT) * t.nn AS DECIMAL(38,0)) AS scaled
       |  FROM w JOIN t ON w.k = t.k),
       |m AS (SELECT k, MAX(ABS(scaled)) AS mx FROM sc GROUP BY k),
       |p AS (SELECT sc.k, MIN(b) AS pb FROM sc JOIN m ON sc.k = m.k
       |      WHERE ABS(sc.scaled) = m.mx GROUP BY sc.k)
       |SELECT sc.k AS key, sc.b AS bucket_start_us, sc.n, sc.cum_n,
       |  CAST(sc.scaled AS DOUBLE) AS cusum_scaled,
       |  CAST(sc.scaled AS DOUBLE) / CAST(sc.d AS DOUBLE) AS cusum,
       |  sc.b = p.pb AS is_peak
       |FROM sc JOIN p ON sc.k = p.k""".stripMargin

  // ---------------------------------------------------------------
  // q155 — weighted CUSUM change point: q153 on the quantized daily
  // VALUE mass (cents, the q100 convention) — a value-level shift is
  // invisible to the count form when volume is steady.
  // ---------------------------------------------------------------
  def q155WeightedCusum(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.cusumChangePointWeighted(
      Tables.events(spark, d), col("ts"),
      bround(col("value") * 100).cast("long"), DaySeconds)

  val q155Sql: String =
    s"""WITH e AS (
       |  SELECT epoch_us(ts) - ((epoch_us(ts) % $DayUs + $DayUs) % $DayUs) AS b,
       |    CAST(round_even(value * 100, 0) AS BIGINT) AS w
       |  FROM events WHERE ts IS NOT NULL),
       |c AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
       |        COALESCE(CAST(SUM(w) AS BIGINT), 0) AS w_sum
       |      FROM e GROUP BY b),
       |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS d,
       |        CAST(SUM(w_sum) AS BIGINT) AS ww FROM c),
       |w2 AS (SELECT b, n, w_sum,
       |    CAST(SUM(w_sum) OVER (ORDER BY b
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_w,
       |    CAST(ROW_NUMBER() OVER (ORDER BY b) AS BIGINT) AS k
       |  FROM c),
       |sc AS (SELECT w2.b, w2.n, w2.w_sum, w2.cum_w, t.d,
       |    CAST(CAST(t.d AS HUGEINT) * w2.cum_w
       |      - CAST(w2.k AS HUGEINT) * t.ww AS DECIMAL(38,0)) AS scaled
       |  FROM w2 CROSS JOIN t),
       |m AS (SELECT MAX(ABS(scaled)) AS mx FROM sc),
       |p AS (SELECT MIN(b) AS pb FROM sc CROSS JOIN m WHERE ABS(scaled) = m.mx)
       |SELECT sc.b AS bucket_start_us, sc.n, sc.w_sum, sc.cum_w,
       |  CAST(sc.scaled AS DOUBLE) AS cusum_scaled,
       |  CAST(sc.scaled AS DOUBLE) / CAST(sc.d AS DOUBLE) AS cusum,
       |  sc.b = p.pb AS is_peak
       |FROM sc CROSS JOIN p""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q155_weighted_cusum" -> (q155WeightedCusum _),
    "q154_group_cusum" -> (q154GroupCusum _),
    "q153_cusum" -> (q153Cusum _),
    "q177_theil_sen" -> (q177TheilSen _),
    "q179_mann_kendall" -> (q179MannKendall _),
    "q180_group_mann_kendall" -> (q180GroupMannKendall _),
    "q189_seasonal_mann_kendall" -> (q189SeasonalMannKendall _),
    "q191_group_seasonal_mann_kendall" -> (q191GroupSeasonalMannKendall _),
    "q178_group_theil_sen" -> (q178GroupTheilSen _),
    "q150_cat_timeline" -> (q150CatTimeline _),
    "q149_ks_timeline" -> (q149KsTimeline _),
    "q33_asof_join" -> (q33AsofJoin _),
    "q34_sessions"  -> (q34Sessions _),
    "q78_arrival_gaps" -> (q78ArrivalGaps _),
    "q80_scd2" -> (q80Scd2 _),
    "q86_funnel" -> (q86Funnel _),
    "q87_cohort_retention" -> (q87CohortRetention _),
    "q88_transitions" -> (q88Transitions _),
    "q100_rolling_daily" -> (q100RollingDaily _),
    "q103_activity_churn" -> (q103Churn _),
    "q104_copair_support" -> (q104CoPairs _),
    "q114_pair_lift" -> (q114PairLift _))

  val oracleSql: Map[String, String] = Map(
    "q155_weighted_cusum" -> q155Sql,
    "q154_group_cusum" -> q154Sql,
    "q153_cusum" -> q153Sql,
    "q177_theil_sen" -> q177Sql,
    "q179_mann_kendall" -> q179Sql,
    "q180_group_mann_kendall" -> q180Sql,
    "q189_seasonal_mann_kendall" -> q189Sql,
    "q191_group_seasonal_mann_kendall" -> q191Sql,
    "q178_group_theil_sen" -> q178Sql,
    "q150_cat_timeline" -> q150Sql,
    "q149_ks_timeline" -> q149Sql,
    "q33_asof_join" -> q33Sql,
    "q34_sessions"  -> q34Sql,
    "q78_arrival_gaps" -> q78Sql,
    "q80_scd2" -> q80Sql,
    "q86_funnel" -> q86Sql,
    "q87_cohort_retention" -> q87Sql,
    "q88_transitions" -> q88Sql,
    "q100_rolling_daily" -> q100Sql,
    "q103_activity_churn" -> q103Sql,
    "q104_copair_support" -> q104Sql,
    "q114_pair_lift" -> q114Sql)
}
