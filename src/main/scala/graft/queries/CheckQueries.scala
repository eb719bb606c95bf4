package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Checks, Reconciliation}

/** Declarative DQ-check queries (q22–q25) with DuckDB oracles.
  *
  * The corpus is clean (no nulls, intact FKs), so completeness and
  * integrity checks run over deliberately perturbed frames — the
  * post-join null pattern and a parent-side filter — which is exactly
  * how these checks surface problems in a real warehouse. The
  * lineitem (orderkey, linenumber) duplication is a genuine corpus
  * property the uniqueness check exposes.
  */
object CheckQueries {

  // ---------------------------------------------------------------
  // q22 — completeness over a left join (natural nulls on the right
  // side where the parent was filtered).
  // ---------------------------------------------------------------
  def q22Completeness(spark: SparkSession, d: String): DataFrame = {
    val joined = Tables.orders(spark, d)
      .join(Tables.customer(spark, d).filter(pmod(col("c_custkey"), lit(7)) =!= 0),
        col("o_custkey") === col("c_custkey"), "left")
    Checks.completeness(joined, Seq("o_orderkey", "c_name", "c_acctbal"))
  }

  val q22Sql: String =
    """WITH j AS (
      |  SELECT o_orderkey, c_name, c_acctbal
      |  FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 7 <> 0) c
      |    ON o_custkey = c_custkey)
      |SELECT 'o_orderkey' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(o_orderkey) AS BIGINT) AS n_nonnull,
      |  CAST(COUNT(o_orderkey) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS completeness FROM j
      |UNION ALL
      |SELECT 'c_name', CAST(COUNT(*) AS BIGINT), CAST(COUNT(c_name) AS BIGINT),
      |  CAST(COUNT(c_name) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) FROM j
      |UNION ALL
      |SELECT 'c_acctbal', CAST(COUNT(*) AS BIGINT), CAST(COUNT(c_acctbal) AS BIGINT),
      |  CAST(COUNT(c_acctbal) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) FROM j""".stripMargin

  // ---------------------------------------------------------------
  // q23 — key uniqueness: customer PK is unique; lineitem
  // (orderkey, linenumber) genuinely is not in this corpus.
  // ---------------------------------------------------------------
  def q23Uniqueness(spark: SparkSession, d: String): DataFrame =
    Checks.uniqueness(Tables.customer(spark, d), Seq("c_custkey"), "customer_pk")
      .unionByName(Checks.uniqueness(
        Tables.lineitem(spark, d), Seq("l_orderkey", "l_linenumber"), "lineitem_pk"))

  val q23Sql: String =
    """SELECT 'customer_pk' AS key_set, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
      |  CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS uniqueness
      |FROM customer
      |UNION ALL
      |SELECT 'lineitem_pk', CAST(COUNT(*) AS BIGINT),
      |  CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
      |  CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------
  // q24 — referential integrity: lineitem→orders intact; orders→
  // (filtered customer) has orphans — the warehouse-lost-rows case.
  // ---------------------------------------------------------------
  def q24ReferentialIntegrity(spark: SparkSession, d: String): DataFrame =
    Checks.referentialIntegrity(
        Tables.lineitem(spark, d), col("l_orderkey"),
        Tables.orders(spark, d), col("o_orderkey"), "lineitem->orders")
      .unionByName(Checks.referentialIntegrity(
        Tables.orders(spark, d), col("o_custkey"),
        Tables.customer(spark, d).filter(pmod(col("c_custkey"), lit(5)) =!= 0),
        col("c_custkey"), "orders->customer_pruned"))

  val q24Sql: String =
    // NOT EXISTS, not NOT IN: anti-join semantics (a NULL child key is
    // an orphan) — NOT IN's three-valued logic would silently disagree
    // with the engine's left_anti exactly when the data is dirty.
    """SELECT 'lineitem->orders' AS relation, CAST(COUNT(*) AS BIGINT) AS n_child,
      |  CAST(COUNT(*) FILTER (WHERE NOT EXISTS
      |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS BIGINT) AS n_orphans,
      |  1.0 - CAST(COUNT(*) FILTER (WHERE NOT EXISTS
      |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE) AS integrity
      |FROM lineitem
      |UNION ALL
      |SELECT 'orders->customer_pruned', CAST(COUNT(*) AS BIGINT),
      |  CAST(COUNT(*) FILTER (WHERE NOT EXISTS
      |    (SELECT 1 FROM customer WHERE c_custkey % 5 <> 0 AND c_custkey = o_custkey)) AS BIGINT),
      |  1.0 - CAST(COUNT(*) FILTER (WHERE NOT EXISTS
      |    (SELECT 1 FROM customer WHERE c_custkey % 5 <> 0 AND c_custkey = o_custkey)) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE)
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------
  // q25 — numeric profile (min/max/exact mean) of lineitem measures.
  // ---------------------------------------------------------------
  def q25ValueBounds(spark: SparkSession, d: String): DataFrame =
    Checks.valueBounds(Tables.lineitem(spark, d),
      Seq("l_quantity", "l_extendedprice", "l_discount"))

  val q25Sql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(MIN($c) AS DOUBLE) AS min_value, CAST(MAX($c) AS DOUBLE) AS max_value,
         |  CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_value
         |FROM lineitem""".stripMargin
    Seq("l_quantity", "l_extendedprice", "l_discount").map(one).mkString("\nUNION ALL\n")
  }

  // ---------------------------------------------------------------
  // q52 — categorical drift week-over-week: event_type distribution
  // of week 2 vs the week-1 baseline, chi-square contribution per
  // category (pure rational arithmetic → engine-exact; the overall
  // statistic is the sum of contributions).
  // ---------------------------------------------------------------
  private val W1 = "2024-01-01 00:00:00"
  private val W2 = "2024-01-08 00:00:00"
  private val W3 = "2024-01-15 00:00:00"

  def q52CategoricalDrift(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    def week(lo: String, hi: String) =
      ev.filter(col("ts") >= to_timestamp(lit(lo)) && col("ts") < to_timestamp(lit(hi)))
    Checks.categoricalDrift(
      current = week(W2, W3), baseline = week(W1, W2), catCol = "event_type")
  }

  val q52Sql: String =
    s"""WITH cur AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_current
       |  FROM events WHERE ts >= TIMESTAMP '$W2' AND ts < TIMESTAMP '$W3'
       |  GROUP BY event_type),
       |base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_baseline
       |  FROM events WHERE ts >= TIMESTAMP '$W1' AND ts < TIMESTAMP '$W2'
       |  GROUP BY event_type),
       |j AS (SELECT coalesce(cur.event_type, base.event_type) AS event_type,
       |    coalesce(n_current, 0) AS n_current,
       |    coalesce(n_baseline, 0) AS n_baseline
       |  FROM cur FULL OUTER JOIN base
       |    ON cur.event_type IS NOT DISTINCT FROM base.event_type),
       |t AS (SELECT CAST(sum(n_current) AS BIGINT) AS tc,
       |    CAST(sum(n_baseline) AS BIGINT) AS tb FROM j)
       |SELECT event_type, n_current, n_baseline,
       |  CASE WHEN n_baseline > 0 AND tc > 0
       |    THEN CAST(n_baseline AS DOUBLE) / CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE)
       |    ELSE NULL END AS expected,
       |  CASE WHEN n_baseline > 0 AND tc > 0
       |    THEN (CAST(n_current AS DOUBLE)
       |        - CAST(n_baseline AS DOUBLE) / CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE))
       |      * (CAST(n_current AS DOUBLE)
       |        - CAST(n_baseline AS DOUBLE) / CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE))
       |      / (CAST(n_baseline AS DOUBLE) / CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE))
       |    ELSE NULL END AS chi2_contribution,
       |  n_baseline = 0 AS new_category
       |FROM j CROSS JOIN t""".stripMargin

  // ---------------------------------------------------------------
  // q106 — quantile drift: week-over-week `value` drift over the
  // BASELINE week's own deciles (PSI shape — every bin carries equal
  // baseline mass, so the test has uniform power where q53's fixed
  // bins concentrate it). Edges are exact ntile order statistics;
  // the oracle rebuilds them with DuckDB's native ntile and re-bins
  // both sides with the same lowest-edge-≥-value rule.
  // ---------------------------------------------------------------
  private val QuantileDriftBins = 10

  def q106QuantileDrift(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    def week(lo: String, hi: String) =
      ev.filter(col("ts") >= to_timestamp(lit(lo)) && col("ts") < to_timestamp(lit(hi)))
    Checks.quantileDrift(
      current = week(W2, W3), baseline = week(W1, W2),
      valueCol = "value", baseTiebreak = col("event_id"),
      nBins = QuantileDriftBins)
  }

  val q106Sql: String =
    s"""WITH base_raw AS (SELECT value AS v, event_id AS tb FROM events
       |    WHERE ts >= TIMESTAMP '$W1' AND ts < TIMESTAMP '$W2'),
       |cur_raw AS (SELECT value AS v FROM events
       |    WHERE ts >= TIMESTAMP '$W2' AND ts < TIMESTAMP '$W3'),
       |r AS (SELECT v, ntile($QuantileDriftBins) OVER (ORDER BY v, tb) AS bin
       |  FROM base_raw WHERE v IS NOT NULL AND NOT isnan(v)),
       |edges AS (SELECT bin, max(v) AS hi FROM r GROUP BY 1),
       |mxb AS (SELECT CAST(max(bin) AS BIGINT) AS mx FROM edges),
       |bbase AS (SELECT coalesce((SELECT CAST(min(e.bin) AS BIGINT) FROM edges e
       |      WHERE e.bin < (SELECT mx FROM mxb) AND b.v <= e.hi),
       |    (SELECT mx FROM mxb)) AS bin
       |  FROM base_raw b WHERE v IS NOT NULL AND NOT isnan(v)),
       |bcur AS (SELECT coalesce((SELECT CAST(min(e.bin) AS BIGINT) FROM edges e
       |      WHERE e.bin < (SELECT mx FROM mxb) AND c.v <= e.hi),
       |    (SELECT mx FROM mxb)) AS bin
       |  FROM cur_raw c WHERE v IS NOT NULL AND NOT isnan(v)),
       |cur AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_current FROM bcur GROUP BY bin),
       |base AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_baseline FROM bbase GROUP BY bin),
       |j AS (SELECT coalesce(cur.bin, base.bin) AS bin,
       |    coalesce(n_current, 0) AS n_current,
       |    coalesce(n_baseline, 0) AS n_baseline
       |  FROM cur FULL OUTER JOIN base ON cur.bin IS NOT DISTINCT FROM base.bin),
       |t AS (SELECT CAST(sum(n_current) AS BIGINT) AS tc,
       |    CAST(sum(n_baseline) AS BIGINT) AS tb2 FROM j)
       |SELECT bin, n_current, n_baseline,
       |  CASE WHEN n_baseline > 0 AND tc > 0
       |    THEN CAST(n_baseline AS DOUBLE) / CAST(tb2 AS DOUBLE) * CAST(tc AS DOUBLE)
       |    ELSE NULL END AS expected,
       |  CASE WHEN n_baseline > 0 AND tc > 0
       |    THEN (CAST(n_current AS DOUBLE)
       |        - CAST(n_baseline AS DOUBLE) / CAST(tb2 AS DOUBLE) * CAST(tc AS DOUBLE))
       |      * (CAST(n_current AS DOUBLE)
       |        - CAST(n_baseline AS DOUBLE) / CAST(tb2 AS DOUBLE) * CAST(tc AS DOUBLE))
       |      / (CAST(n_baseline AS DOUBLE) / CAST(tb2 AS DOUBLE) * CAST(tc AS DOUBLE))
       |    ELSE NULL END AS chi2_contribution,
       |  n_baseline = 0 AS new_category
       |FROM j CROSS JOIN t""".stripMargin

  // ---------------------------------------------------------------
  // q53 — numeric drift: event `value` histogram (fixed 20-unit bins)
  // week-over-week through the same chi-square machinery as q52.
  // ---------------------------------------------------------------
  private val DriftBinWidth = 20.0

  def q53NumericDrift(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    def week(lo: String, hi: String) =
      ev.filter(col("ts") >= to_timestamp(lit(lo)) && col("ts") < to_timestamp(lit(hi)))
    Checks.numericDrift(
      current = week(W2, W3), baseline = week(W1, W2),
      valueCol = "value", binWidth = DriftBinWidth)
  }

  val q53Sql: String =
    s"""WITH curb AS (SELECT CAST(floor(value / $DriftBinWidth) AS BIGINT) AS bin
       |  FROM events WHERE ts >= TIMESTAMP '$W2' AND ts < TIMESTAMP '$W3'),
       |baseb AS (SELECT CAST(floor(value / $DriftBinWidth) AS BIGINT) AS bin
       |  FROM events WHERE ts >= TIMESTAMP '$W1' AND ts < TIMESTAMP '$W2'),
       |cur AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_current FROM curb GROUP BY bin),
       |base AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_baseline FROM baseb GROUP BY bin),
       |j AS (SELECT coalesce(cur.bin, base.bin) AS bin,
       |    coalesce(n_current, 0) AS n_current,
       |    coalesce(n_baseline, 0) AS n_baseline
       |  FROM cur FULL OUTER JOIN base ON cur.bin IS NOT DISTINCT FROM base.bin),
       |t AS (SELECT CAST(sum(n_current) AS BIGINT) AS tc,
       |    CAST(sum(n_baseline) AS BIGINT) AS tb FROM j)
       |SELECT bin, n_current, n_baseline,
       |  CASE WHEN n_baseline > 0 AND tc > 0
       |    THEN CAST(n_baseline AS DOUBLE) / CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE)
       |    ELSE NULL END AS expected,
       |  CASE WHEN n_baseline > 0 AND tc > 0
       |    THEN (CAST(n_current AS DOUBLE)
       |        - CAST(n_baseline AS DOUBLE) / CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE))
       |      * (CAST(n_current AS DOUBLE)
       |        - CAST(n_baseline AS DOUBLE) / CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE))
       |      / (CAST(n_baseline AS DOUBLE) / CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE))
       |    ELSE NULL END AS chi2_contribution,
       |  n_baseline = 0 AS new_category,
       |  CAST(bin AS DOUBLE) * $DriftBinWidth AS bin_start
       |FROM j CROSS JOIN t""".stripMargin

  // ---------------------------------------------------------------
  // q55 — column profile: per-column census of lineitem's numeric
  // measures in ONE scan (a wide aggregate + explode; never a job
  // per column). Mean/stddev derive from exact DECIMAL sums so the
  // doubles are partition-order independent and oracle-exact; the
  // final double formula is written with the identical association
  // in both engines.
  // ---------------------------------------------------------------
  private val ProfileCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def q55Profile(spark: SparkSession, d: String): DataFrame =
    graft.operators.Profiling.profileNumeric(Tables.lineitem(spark, d), ProfileCols)

  val q55Sql: String = ProfileCols.map { c =>
    s"""SELECT '$c' AS "column",
       |  CAST(count($c) AS BIGINT) AS n,
       |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  CAST(min($c) AS DOUBLE) AS min,
       |  CAST(max($c) AS DOUBLE) AS max,
       |  CASE WHEN count($c) > 0 THEN
       |    CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / CAST(count($c) AS DOUBLE)
       |  ELSE NULL END AS mean,
       |  CASE WHEN count($c) > 1 THEN
       |    sqrt(greatest(
       |      CAST(sum(CAST($c AS DECIMAL(18,2)) * CAST($c AS DECIMAL(18,2))) AS DOUBLE)
       |        - CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)
       |          * CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)
       |          / CAST(count($c) AS DOUBLE), 0.0)
       |      / (CAST(count($c) AS DOUBLE) - 1.0))
       |  ELSE NULL END AS stddev
       |FROM lineitem""".stripMargin
  }.mkString("\nUNION ALL\n")

  // ---------------------------------------------------------------
  // q55b — string-column profile of documents: the non-numeric half
  // of the census (n / n_null / n_distinct / min / max + the modal
  // value), same one-scan wide-aggregate shape, top value via the
  // salted two-phase top-k so a high-cardinality column never sorts
  // in one task.
  // ---------------------------------------------------------------
  private val StringProfileCols = Seq("lang", "source")

  def q55bStringProfile(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val top1 = graft.operators.Profiling.topValues(docs, StringProfileCols, k = 1)
      .select(col("column"), col("value").as("top_value"), col("n_rows").as("top_n"))
    graft.operators.Profiling.profileGeneral(docs, StringProfileCols)
      .join(top1, Seq("column"), "left")
  }

  val q55bSql: String = StringProfileCols.map { c =>
    s"""SELECT '$c' AS "column",
       |  CAST(count($c) AS BIGINT) AS n,
       |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  CAST(min($c) AS VARCHAR) AS min,
       |  CAST(max($c) AS VARCHAR) AS max,
       |  (SELECT $c FROM documents WHERE $c IS NOT NULL
       |     GROUP BY $c ORDER BY count(*) DESC, $c ASC LIMIT 1) AS top_value,
       |  (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE $c IS NOT NULL
       |     GROUP BY $c ORDER BY count(*) DESC, $c ASC LIMIT 1) AS top_n
       |FROM documents""".stripMargin
  }.mkString("\nUNION ALL\n")

  // ---------------------------------------------------------------
  // q72 — robust outlier report: per-event-type median/MAD fences
  // over events.value (the modified-z anomaly check whose fences
  // don't move with the anomalies). Values are half-even quantized
  // to 10⁻⁶ integers first, so both engines' linear quantile
  // interpolation is EXACT (integer-valued doubles) and the fence
  // comparison agrees row-for-row.
  // ---------------------------------------------------------------
  def q72RobustOutliers(spark: SparkSession, d: String): DataFrame =
    Checks.robustOutliers(Tables.events(spark, d), "value", "event_type")

  val q72Sql: String =
    """WITH qz AS (
      |  SELECT event_type, round_even(CAST(value AS DOUBLE) * 1000000.0, 0) AS w
      |  FROM events WHERE value IS NOT NULL),
      |med AS (
      |  SELECT event_type, quantile_cont(w, 0.5) AS med FROM qz GROUP BY event_type),
      |dev AS (
      |  SELECT q.event_type, q.w, m.med, abs(q.w - m.med) AS dv
      |  FROM qz q JOIN med m ON q.event_type = m.event_type),
      |mad AS (
      |  SELECT event_type, quantile_cont(dv, 0.5) AS mad FROM dev GROUP BY event_type)
      |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
      |  any_value(d.med) / 1000000.0 AS median_value,
      |  any_value(a.mad) / 1000000.0 AS mad,
      |  CAST(sum(CASE WHEN d.dv > 3.5 * 1.4826 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outliers
      |FROM dev d JOIN mad a ON d.event_type = a.event_type
      |GROUP BY d.event_type""".stripMargin

  // ---------------------------------------------------------------
  // q74 — winsorization report: rank-based (percentile_disc) p05/p95
  // fences per event type, clipped-tail counts, winsorized mean. No
  // interpolation anywhere, so fences are engine-exact by
  // construction; the mean is an exact integer sum of clamped
  // quantized values.
  // ---------------------------------------------------------------
  def q74Winsorize(spark: SparkSession, d: String): DataFrame =
    Checks.winsorizedStats(Tables.events(spark, d), "value", "event_type")

  val q74Sql: String =
    """WITH qz AS (
      |  SELECT event_type, round_even(CAST(value AS DOUBLE) * 1000000.0, 0) AS w
      |  FROM events WHERE value IS NOT NULL),
      |counts AS (
      |  SELECT event_type, w, count(*) AS c FROM qz GROUP BY event_type, w),
      |cum AS (
      |  SELECT event_type, w, c,
      |    sum(c) OVER (PARTITION BY event_type ORDER BY w) AS cumc,
      |    sum(c) OVER (PARTITION BY event_type) AS n
      |  FROM counts),
      |fences AS (
      |  SELECT event_type, max(n) AS n,
      |    min(CASE WHEN cumc >= greatest(1.0, ceil(0.05 * n)) THEN w END) AS lo,
      |    min(CASE WHEN cumc >= ceil(0.95 * n) THEN w END) AS hi
      |  FROM cum GROUP BY event_type)
      |SELECT c.event_type, CAST(f.n AS BIGINT) AS n,
      |  f.lo / 1000000.0 AS lo_fence,
      |  f.hi / 1000000.0 AS hi_fence,
      |  CAST(sum(CASE WHEN c.w < f.lo THEN c.c ELSE 0 END) AS BIGINT) AS n_clipped_lo,
      |  CAST(sum(CASE WHEN c.w > f.hi THEN c.c ELSE 0 END) AS BIGINT) AS n_clipped_hi,
      |  CAST(CAST(sum(CAST(greatest(least(c.w, f.hi), f.lo) AS HUGEINT) * c.c)
      |        AS VARCHAR) AS DOUBLE)
      |    / 1000000.0 / CAST(f.n AS DOUBLE) AS mean_winsorized
      |FROM counts c JOIN fences f USING (event_type)
      |GROUP BY c.event_type, f.n, f.lo, f.hi""".stripMargin

  // ---------------------------------------------------------------
  // q77 — Merkle-style content reconciliation: orders vs a
  // deterministically perturbed copy (every 997th key deleted, every
  // 991st repriced by +0.01). Rows bucket by key hash; each bucket
  // folds (count, bit_xor of the full-row hash), so 64 fingerprints
  // localize every planted difference without ever comparing rows:
  // deletions read as count_mismatch, repricings as content_mismatch
  // in the key's own bucket. The count-only reconciliation (q07)
  // would MISS the repricing entirely — same row count, different
  // content — which is exactly the gap this operator closes.
  // ---------------------------------------------------------------
  private val ReconBuckets = 64
  private val DelMod = 997
  private val ModMod = 991

  def q77MerkleRecon(spark: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(spark, d)
    val dest = orders
      .filter(col("o_orderkey") % DelMod =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % ModMod === 0, col("o_totalprice") + lit(0.01))
          .otherwise(col("o_totalprice")))
    // o_totalprice is a double: half-even quantize to integer cents
    // BEFORE the long cast — Spark truncates double→long where DuckDB
    // rounds, so a bare cast would fingerprint-mismatch on ~half the
    // corpus (the q72/q74 quantization idiom)
    val canonical = concat_ws("|",
      col("o_orderkey"), bround(col("o_totalprice") * 100).cast("long"))
    Reconciliation.contentReconcile(
      orders, dest, col("o_orderkey").cast("string"), canonical, ReconBuckets)
  }

  val q77Sql: String = {
    val h = (s: String) =>
      s"CAST(CAST(('0x' || substr(md5($s), 1, 15)) AS UBIGINT) AS BIGINT)"
    s"""WITH src AS (
       |  SELECT CAST(o_orderkey AS VARCHAR) AS k,
       |    o_orderkey || '|' ||
       |      CAST(round_even(o_totalprice * 100, 0) AS BIGINT) AS canon
       |  FROM orders),
       |dst AS (
       |  SELECT CAST(o_orderkey AS VARCHAR) AS k,
       |    o_orderkey || '|' || CAST(round_even(
       |      (CASE WHEN o_orderkey % $ModMod = 0 THEN o_totalprice + 0.01
       |            ELSE o_totalprice END) * 100, 0) AS BIGINT) AS canon
       |  FROM orders WHERE o_orderkey % $DelMod <> 0),
       |sb AS (
       |  SELECT ${h("k")} % $ReconBuckets AS bucket,
       |    CAST(count(*) AS BIGINT) AS n_source, bit_xor(${h("canon")}) AS fp_source
       |  FROM src GROUP BY 1),
       |db AS (
       |  SELECT ${h("k")} % $ReconBuckets AS bucket,
       |    CAST(count(*) AS BIGINT) AS n_dest, bit_xor(${h("canon")}) AS fp_dest
       |  FROM dst GROUP BY 1)
       |SELECT bucket,
       |  COALESCE(n_source, 0) AS n_source, COALESCE(n_dest, 0) AS n_dest,
       |  COALESCE(fp_source, 0) AS fp_source, COALESCE(fp_dest, 0) AS fp_dest,
       |  CASE WHEN COALESCE(n_source, 0) <> COALESCE(n_dest, 0) THEN 'count_mismatch'
       |       WHEN COALESCE(fp_source, 0) <> COALESCE(fp_dest, 0) THEN 'content_mismatch'
       |       ELSE 'ok' END AS status
       |FROM sb FULL JOIN db USING (bucket)""".stripMargin
  }

  // ---------------------------------------------------------------
  // q79 — equi-width histogram of l_extendedprice (20 bins, empty
  // bins included). Every edge is the same IEEE double expression on
  // both engines, so boundaries and assignments hash-match exactly.
  // ---------------------------------------------------------------
  private val HistBins = 20

  def q79Histogram(spark: SparkSession, d: String): DataFrame =
    graft.operators.Profiling.histogram(
      Tables.lineitem(spark, d), col("l_extendedprice"), HistBins)

  val q79Sql: String =
    s"""WITH s AS (
       |  SELECT CAST(min(l_extendedprice) AS DOUBLE) AS mn,
       |         CAST(max(l_extendedprice) AS DOUBLE) AS mx
       |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
       |c AS (
       |  SELECT CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
       |         ELSE least(${HistBins - 1}, CAST(floor((l_extendedprice - mn)
       |                / ((mx - mn) / $HistBins.0)) AS BIGINT))
       |         END AS bin,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM lineitem, s WHERE l_extendedprice IS NOT NULL GROUP BY 1),
       |spine AS (SELECT unnest(range(0, $HistBins)) AS bin, mn, mx FROM s)
       |SELECT spine.bin, mn + spine.bin * ((mx - mn) / $HistBins.0) AS lo,
       |       mn + (spine.bin + 1) * ((mx - mn) / $HistBins.0) AS hi,
       |       COALESCE(n, 0) AS n
       |FROM spine LEFT JOIN c USING (bin)""".stripMargin

  // ---------------------------------------------------------------
  // q116 — approximate quantiles from MERGEABLE fixed-bounds
  // histogram partials: p50/p90/p99 of events.value estimated from a
  // 50-bin [0, 500) census — the monitoring path that re-estimates
  // quantiles per ingest batch by integer-adding bin counts, no
  // history rescans (exact counterpart: q113). Bounds chosen so
  // width = 10.0 exactly; targets are ceil of one double product;
  // interpolation is a replayable chain of correctly-rounded ops;
  // probabilities cross as stringified literals.
  // ---------------------------------------------------------------
  private val HqLo = 0.0
  private val HqHi = 500.0
  private val HqBins = 50
  private val HqProbs = Seq(0.5, 0.9, 0.99)

  def q116HistQuantiles(spark: SparkSession, d: String): DataFrame =
    graft.operators.Profiling.histogramQuantile(
      graft.operators.Profiling.histogramFixed(
        Tables.events(spark, d), col("value"), HqLo, HqHi, HqBins),
      HqProbs)

  val q116Sql: String = {
    val width = (HqHi - HqLo) / HqBins
    val probsValues = HqProbs.map(p => s"(CAST('$p' AS DOUBLE))").mkString(", ")
    s"""WITH c AS (
       |  SELECT least(${HqBins - 1}, greatest(0,
       |      CAST(floor((value - CAST('$HqLo' AS DOUBLE)) / CAST('$width' AS DOUBLE)) AS BIGINT)))
       |    AS bin, CAST(count(*) AS BIGINT) AS n
       |  FROM events WHERE value IS NOT NULL AND NOT isnan(value) GROUP BY 1),
       |h AS (
       |  SELECT spine.bin,
       |    CAST('$HqLo' AS DOUBLE) + spine.bin * CAST('$width' AS DOUBLE) AS lo,
       |    CAST('$HqLo' AS DOUBLE) + (spine.bin + 1) * CAST('$width' AS DOUBLE) AS hi,
       |    COALESCE(n, 0) AS n
       |  FROM (SELECT unnest(range(0, $HqBins)) AS bin) spine LEFT JOIN c USING (bin)),
       |cum AS (
       |  SELECT bin, lo, hi, n,
       |    CAST(sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |    CAST(sum(n) OVER () AS BIGINT) AS total
       |  FROM h),
       |ps AS (SELECT * FROM (VALUES $probsValues) AS t(p))
       |SELECT p, bin, lo, hi, n, cum,
       |  lo + (hi - lo) * (CAST(target - (cum - n) AS DOUBLE) / CAST(n AS DOUBLE)) AS estimate
       |FROM (
       |  SELECT p, bin, lo, hi, n, cum,
       |    CAST(ceil(p * CAST(total AS DOUBLE)) AS BIGINT) AS target
       |  FROM cum CROSS JOIN ps WHERE total > 0)
       |WHERE cum >= target AND (cum - n) < target""".stripMargin
  }

  // ---------------------------------------------------------------
  // q117 — per-source quantile monitor: q116's mergeable census keyed
  // by event_type, quantiles per group from the SHARED fixed domain
  // (cross-source comparable, unlike per-group-bounds histograms).
  // The estimator windows partition by group — groups-way parallel,
  // per-group state ≤ bins rows.
  // ---------------------------------------------------------------
  def q117GroupHistQuantiles(spark: SparkSession, d: String): DataFrame =
    graft.operators.Profiling.histogramQuantileByGroup(
      graft.operators.Profiling.histogramFixedByGroup(
        Tables.events(spark, d), col("event_type"), col("value"),
        HqLo, HqHi, HqBins),
      HqProbs)

  val q117Sql: String = {
    val width = (HqHi - HqLo) / HqBins
    val probsValues = HqProbs.map(p => s"(CAST('$p' AS DOUBLE))").mkString(", ")
    s"""WITH c AS (
       |  SELECT event_type AS grp, least(${HqBins - 1}, greatest(0,
       |      CAST(floor((value - CAST('$HqLo' AS DOUBLE)) / CAST('$width' AS DOUBLE)) AS BIGINT)))
       |    AS bin, CAST(count(*) AS BIGINT) AS n
       |  FROM events WHERE value IS NOT NULL AND NOT isnan(value) GROUP BY 1, 2),
       |spine AS (
       |  SELECT grp, bin FROM (SELECT DISTINCT grp FROM c)
       |  CROSS JOIN (SELECT unnest(range(0, $HqBins)) AS bin)),
       |h AS (
       |  SELECT spine.grp, spine.bin,
       |    CAST('$HqLo' AS DOUBLE) + spine.bin * CAST('$width' AS DOUBLE) AS lo,
       |    CAST('$HqLo' AS DOUBLE) + (spine.bin + 1) * CAST('$width' AS DOUBLE) AS hi,
       |    COALESCE(n, 0) AS n
       |  FROM spine LEFT JOIN c ON spine.grp = c.grp AND spine.bin = c.bin),
       |cum AS (
       |  SELECT grp, bin, lo, hi, n,
       |    CAST(sum(n) OVER (PARTITION BY grp ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |    CAST(sum(n) OVER (PARTITION BY grp) AS BIGINT) AS total
       |  FROM h),
       |ps AS (SELECT * FROM (VALUES $probsValues) AS t(p))
       |SELECT grp AS "group", p, bin, lo, hi, n, cum,
       |  lo + (hi - lo) * (CAST(target - (cum - n) AS DOUBLE) / CAST(n AS DOUBLE)) AS estimate
       |FROM (
       |  SELECT grp, p, bin, lo, hi, n, cum,
       |    CAST(ceil(p * CAST(total AS DOUBLE)) AS BIGINT) AS target
       |  FROM cum CROSS JOIN ps WHERE total > 0)
       |WHERE cum >= target AND (cum - n) < target""".stripMargin
  }

  // ---------------------------------------------------------------
  // q81 — inclusion-dependency profile (FK discovery): distinct-value
  // containment for four candidate edges — three intact (coefficient
  // 1.0 / organic) and one deliberately violated (parent filtered to
  // every third customer → ~0.333).
  // ---------------------------------------------------------------
  def q81Inclusion(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d); val or = Tables.orders(spark, d)
    val cu = Tables.customer(spark, d)
    Checks.inclusionReport(Seq(
      Checks.InclusionSpec("lineitem_orderkey_in_orders",
        li, col("l_orderkey"), or, col("o_orderkey")),
      Checks.InclusionSpec("orders_custkey_in_customer",
        or, col("o_custkey"), cu, col("c_custkey")),
      Checks.InclusionSpec("customer_custkey_in_orders",
        cu, col("c_custkey"), or, col("o_custkey")),
      Checks.InclusionSpec("orders_custkey_in_customer_mod3",
        or, col("o_custkey"),
        cu.filter(col("c_custkey") % 3 === 0), col("c_custkey"))))
  }

  val q81Sql: String = {
    def edge(name: String, ck: String, ct: String, pk: String, pt: String) =
      s"""SELECT '$name' AS relation,
         |  CAST(count(*) AS BIGINT) AS n_child_distinct,
         |  CAST(count(CASE WHEN p.k IS NOT NULL THEN 1 END) AS BIGINT) AS n_matched,
         |  CASE WHEN count(*) > 0 THEN
         |    CAST(count(CASE WHEN p.k IS NOT NULL THEN 1 END) AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE)
         |  END AS inclusion
         |FROM (SELECT DISTINCT $ck AS k FROM $ct WHERE $ck IS NOT NULL) c
         |LEFT JOIN (SELECT DISTINCT $pk AS k FROM $pt) p USING (k)""".stripMargin
    Seq(
      edge("lineitem_orderkey_in_orders", "l_orderkey", "lineitem",
        "o_orderkey", "orders"),
      edge("orders_custkey_in_customer", "o_custkey", "orders",
        "c_custkey", "customer"),
      edge("customer_custkey_in_orders", "c_custkey", "customer",
        "o_custkey", "orders"),
      edge("orders_custkey_in_customer_mod3", "o_custkey", "orders",
        "c_custkey", "(SELECT * FROM customer WHERE c_custkey % 3 = 0)"))
      .mkString("\nUNION ALL\n")
  }

  // ---------------------------------------------------------------
  // q83 — volume-anomaly monitor: daily event counts per type scored
  // against the trailing 7 observed days (current day excluded from
  // its own baseline); |n − mean| > 2σ flags. The window folds exact
  // integer (count, sum, sum-of-squares), so mean/σ/flag are the
  // same IEEE doubles on both engines.
  // ---------------------------------------------------------------
  private val VolTrailing = 7
  private val VolThreshold = 2.0

  def q83VolumeAnomalies(spark: SparkSession, d: String): DataFrame =
    Checks.volumeAnomalies(Tables.events(spark, d),
      col("event_type"), col("ts"),
      trailing = VolTrailing, threshold = VolThreshold)

  val q83Sql: String =
    s"""WITH daily AS (
       |  SELECT event_type AS grp, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |w AS (
       |  SELECT grp, day, n,
       |    CAST(count(n) OVER win AS BIGINT) AS n_prior,
       |    CAST(sum(n) OVER win AS BIGINT) AS s,
       |    CAST(sum(n*n) OVER win AS BIGINT) AS sq
       |  FROM daily
       |  WINDOW win AS (PARTITION BY grp ORDER BY day
       |                 ROWS BETWEEN $VolTrailing PRECEDING AND 1 PRECEDING)),
       |m AS (
       |  SELECT grp, day, n, n_prior,
       |    CASE WHEN n_prior >= 3
       |      THEN CAST(s AS DOUBLE) / CAST(n_prior AS DOUBLE) END AS mean_prior,
       |    CASE WHEN n_prior >= 3 THEN sqrt(greatest(
       |      (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
       |         / CAST(n_prior AS DOUBLE)) / (CAST(n_prior AS DOUBLE) - 1.0),
       |      0.0)) END AS std_prior
       |  FROM w)
       |SELECT grp AS "group", day, n, n_prior, mean_prior, std_prior,
       |  CASE WHEN n_prior >= 3 AND std_prior > 0.0
       |    THEN abs(CAST(n AS DOUBLE) - mean_prior) > $VolThreshold * std_prior
       |  END AS is_anomaly
       |FROM m""".stripMargin

  // ---------------------------------------------------------------
  // q84 — validation-gate census: per-rule violation counts + rate
  // and the ANY row (what quarantine would reject), in one scan.
  // Two rules genuinely violate on this corpus, one passes clean.
  // ---------------------------------------------------------------
  private def q84Rules = Seq(
    Checks.ValidationRule("qty_le_40", col("l_quantity") <= 40),
    Checks.ValidationRule("discount_le_05", col("l_discount") <= 0.05),
    Checks.ValidationRule("price_positive", col("l_extendedprice") > 0))

  def q84ValidationReport(spark: SparkSession, d: String): DataFrame =
    Checks.validationReport(Tables.lineitem(spark, d), q84Rules)

  val q84Sql: String =
    """SELECT u.rule, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE u.rule
      |    WHEN 'qty_le_40' THEN CASE WHEN NOT COALESCE(l_quantity <= 40, FALSE) THEN 1 ELSE 0 END
      |    WHEN 'discount_le_05' THEN CASE WHEN NOT COALESCE(l_discount <= 0.05, FALSE) THEN 1 ELSE 0 END
      |    WHEN 'price_positive' THEN CASE WHEN NOT COALESCE(l_extendedprice > 0, FALSE) THEN 1 ELSE 0 END
      |    ELSE CASE WHEN NOT COALESCE(l_quantity <= 40, FALSE)
      |           OR NOT COALESCE(l_discount <= 0.05, FALSE)
      |           OR NOT COALESCE(l_extendedprice > 0, FALSE) THEN 1 ELSE 0 END
      |  END) AS BIGINT) AS n_violations,
      |  CASE WHEN count(*) > 0 THEN
      |    CAST(sum(CASE u.rule
      |      WHEN 'qty_le_40' THEN CASE WHEN NOT COALESCE(l_quantity <= 40, FALSE) THEN 1 ELSE 0 END
      |      WHEN 'discount_le_05' THEN CASE WHEN NOT COALESCE(l_discount <= 0.05, FALSE) THEN 1 ELSE 0 END
      |      WHEN 'price_positive' THEN CASE WHEN NOT COALESCE(l_extendedprice > 0, FALSE) THEN 1 ELSE 0 END
      |      ELSE CASE WHEN NOT COALESCE(l_quantity <= 40, FALSE)
      |             OR NOT COALESCE(l_discount <= 0.05, FALSE)
      |             OR NOT COALESCE(l_extendedprice > 0, FALSE) THEN 1 ELSE 0 END
      |    END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |  END AS violation_rate
      |FROM lineitem
      |CROSS JOIN (SELECT unnest(['qty_le_40', 'discount_le_05',
      |                           'price_positive', 'ANY']) AS rule) u
      |GROUP BY u.rule""".stripMargin

  // ---------------------------------------------------------------
  // q85 — functional-dependency profile: three candidates with
  // deterministic outcomes on this corpus — the (orderkey,
  // linenumber) "PK" is violated by the known duplication quirk
  // (~26% of groups), partkey→suppkey fails everywhere (parts have
  // many suppliers), orderkey→shipdate fails for multi-line orders.
  // ---------------------------------------------------------------
  def q85FdReport(spark: SparkSession, d: String): DataFrame =
    Checks.fdReport(Tables.lineitem(spark, d), Seq(
      Checks.FdSpec("pk_determines_partkey",
        Seq(col("l_orderkey"), col("l_linenumber")), col("l_partkey")),
      Checks.FdSpec("partkey_determines_suppkey",
        Seq(col("l_partkey")), col("l_suppkey")),
      Checks.FdSpec("orderkey_determines_shipdate",
        Seq(col("l_orderkey")), col("l_shipdate"))))

  val q85Sql: String = {
    def cand(name: String, lhs: String, rhs: String) =
      s"""SELECT '$name' AS fd,
         |  CAST(count(*) AS BIGINT) AS n_groups,
         |  CAST(sum(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
         |  CASE WHEN count(*) > 0 THEN
         |    CAST(sum(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |      / CAST(count(*) AS DOUBLE)
         |  END AS violation_rate,
         |  CAST(max(nrhs) AS BIGINT) AS max_rhs_per_group
         |FROM (SELECT $lhs, count(DISTINCT $rhs) AS nrhs
         |      FROM lineitem GROUP BY $lhs)""".stripMargin
    Seq(
      cand("pk_determines_partkey", "l_orderkey, l_linenumber", "l_partkey"),
      cand("partkey_determines_suppkey", "l_partkey", "l_suppkey"),
      cand("orderkey_determines_shipdate", "l_orderkey", "l_shipdate"))
      .mkString("\nUNION ALL\n")
  }

  // ---------------------------------------------------------------
  // q89 — IEEE float audit: the corpus is clean, so the price column
  // is deterministically poisoned in-query (every 97th key → NaN,
  // 89th → +Inf, 83rd → −Inf, first match wins) and the audit must
  // count each species exactly; the untouched quantity column pins
  // the all-finite case.
  // ---------------------------------------------------------------
  def q89FloatAudit(spark: SparkSession, d: String): DataFrame = {
    val poisoned = Tables.lineitem(spark, d).select(
      when(col("l_orderkey") % 97 === 0, lit(Double.NaN))
        .when(col("l_orderkey") % 89 === 0, lit(Double.PositiveInfinity))
        .when(col("l_orderkey") % 83 === 0, lit(Double.NegativeInfinity))
        .otherwise(col("l_extendedprice")).as("price"),
      col("l_quantity").as("qty"))
    Checks.floatAudit(poisoned, Seq("price", "qty"))
  }

  val q89Sql: String = {
    def audit(c: String) =
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(sum(CASE WHEN COALESCE(isnan($c), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
         |  CAST(sum(CASE WHEN $c = 'Infinity'::DOUBLE THEN 1 ELSE 0 END) AS BIGINT) AS n_posinf,
         |  CAST(sum(CASE WHEN $c = '-Infinity'::DOUBLE THEN 1 ELSE 0 END) AS BIGINT) AS n_neginf,
         |  CAST(sum(CASE WHEN $c IS NOT NULL AND NOT COALESCE(isnan($c), FALSE)
         |    AND $c <> 'Infinity'::DOUBLE AND $c <> '-Infinity'::DOUBLE
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_finite
         |FROM t""".stripMargin
    s"""WITH t AS (
       |  SELECT CASE WHEN l_orderkey % 97 = 0 THEN 'NaN'::DOUBLE
       |              WHEN l_orderkey % 89 = 0 THEN 'Infinity'::DOUBLE
       |              WHEN l_orderkey % 83 = 0 THEN '-Infinity'::DOUBLE
       |              ELSE l_extendedprice END AS price,
       |         l_quantity AS qty
       |  FROM lineitem)
       |${audit("price")}
       |UNION ALL
       |${audit("qty")}""".stripMargin
  }

  // ---------------------------------------------------------------
  // q90 — weekday-seasonal volume baseline: each day scores against
  // its trailing SAME-WEEKDAY observations (weekly seasonality never
  // reads as anomaly). The weekday key is partition-only, so Spark's
  // 1-7 vs DuckDB's 0-6 numbering is irrelevant — the equivalence
  // classes are identical.
  // ---------------------------------------------------------------
  private val SeasTrailing = 3
  private val SeasThreshold = 1.5

  def q90SeasonalVolume(spark: SparkSession, d: String): DataFrame =
    Checks.volumeAnomalies(Tables.events(spark, d),
      col("event_type"), col("ts"),
      trailing = SeasTrailing, threshold = SeasThreshold, perWeekday = true)

  val q90Sql: String =
    s"""WITH daily AS (
       |  SELECT event_type AS grp, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |w AS (
       |  SELECT grp, day, n,
       |    CAST(count(n) OVER win AS BIGINT) AS n_prior,
       |    CAST(sum(n) OVER win AS BIGINT) AS s,
       |    CAST(sum(n*n) OVER win AS BIGINT) AS sq
       |  FROM daily
       |  WINDOW win AS (PARTITION BY grp, dayofweek(day) ORDER BY day
       |                 ROWS BETWEEN $SeasTrailing PRECEDING AND 1 PRECEDING)),
       |m AS (
       |  SELECT grp, day, n, n_prior,
       |    CASE WHEN n_prior >= 3
       |      THEN CAST(s AS DOUBLE) / CAST(n_prior AS DOUBLE) END AS mean_prior,
       |    CASE WHEN n_prior >= 3 THEN sqrt(greatest(
       |      (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
       |         / CAST(n_prior AS DOUBLE)) / (CAST(n_prior AS DOUBLE) - 1.0),
       |      0.0)) END AS std_prior
       |  FROM w)
       |SELECT grp AS "group", day, n, n_prior, mean_prior, std_prior,
       |  CASE WHEN n_prior >= 3 AND std_prior > 0.0
       |    THEN abs(CAST(n AS DOUBLE) - mean_prior) > $SeasThreshold * std_prior
       |  END AS is_anomaly
       |FROM m""".stripMargin

  // ---------------------------------------------------------------
  // q91 — per-group histogram: price distribution per return flag,
  // each flag bucketed over its own range (10 bins, empty kept).
  // ---------------------------------------------------------------
  private val GrpHistBins = 10

  def q91GroupHistogram(spark: SparkSession, d: String): DataFrame =
    graft.operators.Profiling.histogramByGroup(
      Tables.lineitem(spark, d), col("l_returnflag"),
      col("l_extendedprice"), GrpHistBins)

  val q91Sql: String =
    s"""WITH nn AS (
       |  SELECT l_returnflag AS grp, CAST(l_extendedprice AS DOUBLE) AS v
       |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
       |b AS (SELECT grp, min(v) AS mn, max(v) AS mx FROM nn GROUP BY 1),
       |c AS (
       |  SELECT nn.grp,
       |    CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
       |      ELSE least(${GrpHistBins - 1},
       |        CAST(floor((v - mn) / ((mx - mn) / $GrpHistBins.0)) AS BIGINT))
       |    END AS bin,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM nn JOIN b ON nn.grp = b.grp GROUP BY 1, 2),
       |spine AS (SELECT grp, mn, mx, unnest(range(0, $GrpHistBins)) AS bin FROM b)
       |SELECT spine.grp AS "group", spine.bin,
       |  mn + spine.bin * ((mx - mn) / $GrpHistBins.0) AS lo,
       |  mn + (spine.bin + 1) * ((mx - mn) / $GrpHistBins.0) AS hi,
       |  COALESCE(n, 0) AS n
       |FROM spine LEFT JOIN c ON spine.grp = c.grp AND spine.bin = c.bin""".stripMargin

  // ---------------------------------------------------------------
  // q93 — Benford first-digit census over extended prices: the
  // fabricated-data / unit-mix-up screen. The digit extraction uses
  // the two-sided ulp fixup (see Checks.benfordFirstDigit) so both
  // engines land on identical integer digits; expectations are the
  // same Scala doubles stringified into the VALUES list; the
  // chi-square term is +,*,/ only.
  // ---------------------------------------------------------------
  def q93Benford(spark: SparkSession, d: String): DataFrame =
    Checks.benfordFirstDigit(Tables.lineitem(spark, d), col("l_extendedprice"))

  val q93Sql: String =
    s"""WITH vals AS (
       |  SELECT abs(CAST(l_extendedprice AS DOUBLE)) AS v FROM lineitem
       |  WHERE l_extendedprice IS NOT NULL
       |    AND abs(CAST(l_extendedprice AS DOUBLE)) > 0
       |    AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
       |    AND NOT isinf(CAST(l_extendedprice AS DOUBLE))),
       |d0 AS (SELECT v,
       |    CAST(floor(v / power(10.0, floor(log10(v)))) AS BIGINT) AS raw
       |  FROM vals),
       |dig AS (SELECT CASE
       |    WHEN raw >= 10 THEN CAST(floor(CAST(raw AS DOUBLE) / 10.0) AS BIGINT)
       |    WHEN raw = 0 THEN CAST(floor(v / power(10.0, floor(log10(v)) - 1)) AS BIGINT)
       |    ELSE raw END AS digit
       |  FROM d0),
       |counts AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM dig GROUP BY 1),
       |exp AS (SELECT * FROM (VALUES ${Checks.benfordExpectedSql}) AS t(digit, expected_p)),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts)
       |SELECT CAST(exp.digit AS BIGINT) AS digit,
       |  COALESCE(n, CAST(0 AS BIGINT)) AS n,
       |  CASE WHEN t > 0
       |    THEN CAST(COALESCE(n, 0) AS DOUBLE) / CAST(t AS DOUBLE) END AS observed_p,
       |  expected_p,
       |  CASE WHEN t > 0 THEN
       |    (CAST(COALESCE(n, 0) AS DOUBLE) - CAST(t AS DOUBLE) * expected_p)
       |      * (CAST(COALESCE(n, 0) AS DOUBLE) - CAST(t AS DOUBLE) * expected_p)
       |      / (CAST(t AS DOUBLE) * expected_p) END AS chi2_contribution
       |FROM exp LEFT JOIN counts ON exp.digit = counts.digit CROSS JOIN tot""".stripMargin

  // ---------------------------------------------------------------
  // q94 — per-user order-inversion census: does `value` ever run
  // backwards along a user's event timeline? (user_id, ts) is unique
  // in the corpus, so the walk order is deterministic in both
  // engines and the inversion counts are exact integers.
  // ---------------------------------------------------------------
  def q94OrderInversions(spark: SparkSession, d: String): DataFrame =
    Checks.orderInversions(Tables.events(spark, d),
      col("user_id"), col("ts"), col("value"))

  val q94Sql: String =
    """WITH s AS (
      |  SELECT user_id, value,
      |    lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM events)
      |SELECT user_id AS key,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN prev > value THEN 1 ELSE 0 END) AS BIGINT) AS n_inversions,
      |  sum(CASE WHEN prev > value THEN 1 ELSE 0 END) = 0 AS is_monotone
      |FROM s GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q96 — label class balance over the embeddings table: row count,
  // class count, Gini impurity. Σ pᵢ² folds as an exact decimal
  // Σ nᵢ² over N² (order-independent), through a string to double
  // once — a single correctly-rounded division is the only float.
  // ---------------------------------------------------------------
  def q96ClassBalance(spark: SparkSession, d: String): DataFrame =
    graft.operators.Profiling.classBalance(
      Tables.embeddings(spark, d), col("label"))

  val q96Sql: String =
    """WITH c AS (SELECT label, CAST(count(*) AS BIGINT) AS n
      |  FROM embeddings GROUP BY label),
      |f AS (SELECT CAST(sum(n) AS BIGINT) AS N,
      |    CAST(count(*) AS BIGINT) AS k,
      |    sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS ssq
      |  FROM c)
      |SELECT COALESCE(N, CAST(0 AS BIGINT)) AS n_rows, k AS n_classes,
      |  CASE WHEN N > 0 THEN
      |    1.0 - CAST(CAST(ssq AS VARCHAR) AS DOUBLE)
      |      / (CAST(N AS DOUBLE) * CAST(N AS DOUBLE)) END AS gini
      |FROM f""".stripMargin

  // ---------------------------------------------------------------
  // q98 — privacy census over customers: quasi-identifiers
  // (mktsegment, nationkey), sensitive attribute = debt status
  // (acctbal < 0 — "everyone in this segment+nation group is in
  // debt" is the homogeneity leak), k=10, l=2. Both properties
  // violate nontrivially at sf0.01 (35 under-k classes; uniform-debt
  // classes leak under l). Counts are exact integers; the oracle's
  // distinct is written null-safe (count distinct + has-null flag)
  // to pin the same null-as-a-value semantics the operator
  // implements.
  // ---------------------------------------------------------------
  private val PrivacyK = 10
  private val PrivacyL = 2

  def q98PrivacyCensus(spark: SparkSession, d: String): DataFrame =
    Checks.privacyCensus(Tables.customer(spark, d),
      Seq("c_mktsegment", "c_nationkey"), col("c_acctbal") < 0,
      k = PrivacyK, l = PrivacyL)

  val q98Sql: String =
    s"""WITH cls AS (
       |  SELECT c_mktsegment, c_nationkey,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(count(DISTINCT (c_acctbal < 0))
       |      + max(CASE WHEN (c_acctbal < 0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nd
       |  FROM customer GROUP BY 1, 2)
       |SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       |  CAST(count(*) AS BIGINT) AS n_classes,
       |  CAST(sum(CASE WHEN n < $PrivacyK THEN 1 ELSE 0 END) AS BIGINT)
       |    AS k_violating_classes,
       |  CAST(sum(CASE WHEN n < $PrivacyK THEN n ELSE 0 END) AS BIGINT)
       |    AS k_risky_rows,
       |  CAST(sum(CASE WHEN nd < $PrivacyL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS l_violating_classes,
       |  CAST(sum(CASE WHEN nd < $PrivacyL THEN n ELSE 0 END) AS BIGINT)
       |    AS l_risky_rows
       |FROM cls""".stripMargin

  // ---------------------------------------------------------------
  // q99 — k-anonymization by record suppression: the customers that
  // SURVIVE dropping every under-k (mktsegment, nationkey) class —
  // q98's executor. 1500 − 279 = 1221 rows at sf0.01. The oracle
  // joins null-safely (IS NOT DISTINCT FROM) to pin the operator's
  // null-class semantics even though this corpus has no nulls.
  // ---------------------------------------------------------------
  def q99SuppressUnderK(spark: SparkSession, d: String): DataFrame = {
    val (kept, _) = Checks.suppressUnderK(
      Tables.customer(spark, d), Seq("c_mktsegment", "c_nationkey"), PrivacyK)
    kept.select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
  }

  val q99Sql: String =
    s"""WITH cls AS (
       |  SELECT c_mktsegment AS m, c_nationkey AS n,
       |    CAST(count(*) AS BIGINT) AS cn
       |  FROM customer GROUP BY 1, 2)
       |SELECT c.c_custkey, c.c_mktsegment, c.c_nationkey
       |FROM customer c JOIN cls
       |  ON c.c_mktsegment IS NOT DISTINCT FROM cls.m
       |  AND c.c_nationkey IS NOT DISTINCT FROM cls.n
       |WHERE cn >= $PrivacyK""".stripMargin

  // ---------------------------------------------------------------
  // q101 — join-key skew census on orders.o_custkey: the one-row
  // "is this key safe to shuffle 100 TB on?" probe. Cross-products
  // in the over-mean counts are exact decimals (HUGEINT on the
  // DuckDB side); the two doubles are single divisions of exact
  // longs, mirrored expression-for-expression.
  // ---------------------------------------------------------------
  def q101KeySkew(spark: SparkSession, d: String): DataFrame =
    graft.operators.Profiling.keySkew(Tables.orders(spark, d), col("o_custkey"))

  val q101Sql: String =
    """WITH c AS (
      |  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS kn
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(sum(kn) AS BIGINT) AS tot,
      |             CAST(count(*) AS BIGINT) AS nk
      |      FROM c)
      |SELECT max(tot) AS n_rows, max(nk) AS n_keys, max(kn) AS max_per_key,
      |  CAST(max(tot) AS DOUBLE) / CAST(max(nk) AS DOUBLE) AS avg_per_key,
      |  CAST(max(kn) AS DOUBLE)
      |    / (CAST(max(tot) AS DOUBLE) / CAST(max(nk) AS DOUBLE)) AS skew_ratio,
      |  CAST(sum(CASE WHEN CAST(kn AS HUGEINT) * CAST(nk AS HUGEINT)
      |    > 2 * CAST(tot AS HUGEINT) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_keys_over_2x_mean,
      |  CAST(sum(CASE WHEN CAST(kn AS HUGEINT) * CAST(nk AS HUGEINT)
      |    > 10 * CAST(tot AS HUGEINT) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_keys_over_10x_mean
      |FROM c, t""".stripMargin

  // ---------------------------------------------------------------
  // q102 — exact equal-frequency octiles of l_extendedprice,
  // summarized per bin: the distributed-ntile shape (cell-bucketed
  // prefix-sum ranks — no single-task global sort) against DuckDB's
  // native ntile over the same deterministic (value, line-id) order.
  // ---------------------------------------------------------------
  private val EqFreqBins = 8

  def q102EqFreqBins(spark: SparkSession, d: String): DataFrame =
    graft.operators.Profiling.equalFrequencyBins(
        Tables.lineitem(spark, d), col("l_extendedprice"),
        col("l_orderkey") * 10 + col("l_linenumber"), EqFreqBins)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))

  val q102Sql: String =
    s"""WITH r AS (
       |  SELECT l_extendedprice AS v,
       |    ntile($EqFreqBins) OVER (
       |      ORDER BY l_extendedprice, l_orderkey * 10 + l_linenumber) AS bin
       |  FROM lineitem)
       |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
       |  min(v) AS lo, max(v) AS hi
       |FROM r GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q107 — count-min sketch frequency census on events.user_id:
  // build the depth×width counter table, probe every distinct user
  // back through it, and report estimate vs exact count (overcount
  // ≥ 0 always — CMS collisions only add). Hashing is the portable
  // 60-bit md5 prefix, so the oracle states the IDENTICAL buckets
  // and the gate hash-checks the sketch itself, not just its shape.
  // ---------------------------------------------------------------
  private val CmsDepth = 4
  private val CmsWidth = 512

  def q107CmsCounts(spark: SparkSession, d: String): DataFrame = {
    import graft.operators.Profiling
    val ev = Tables.events(spark, d).filter(col("user_id").isNotNull)
    val counters =
      Profiling.countMinCounters(ev, col("user_id"), CmsDepth, CmsWidth)
    val est = Profiling.countMinEstimate(
      counters, ev.select(col("user_id")).distinct(), col("user_id"),
      CmsDepth, CmsWidth)
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("true_n"))
    est.withColumnRenamed("key", "user_id")
      .join(exact, Seq("user_id"))
      .select(col("user_id"), col("est_n"), col("true_n"),
        (col("est_n") - col("true_n")).as("overcount"))
  }

  val q107Sql: String = {
    def bucket(keyExpr: String) =
      s"""CAST(CAST(('0x' || substr(md5(CAST(rw AS VARCHAR) || ':' || $keyExpr),
         |    1, 15)) AS UBIGINT) % $CmsWidth AS BIGINT)""".stripMargin
    s"""WITH k AS (SELECT user_id, CAST(user_id AS VARCHAR) AS ks
       |  FROM events WHERE user_id IS NOT NULL),
       |r AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(rw)),
       |counters AS (
       |  SELECT rw, ${bucket("ks")} AS bucket, CAST(count(*) AS BIGINT) AS n
       |  FROM k CROSS JOIN r GROUP BY 1, 2),
       |probe AS (SELECT DISTINCT user_id, ks FROM k),
       |pb AS (SELECT user_id, rw, ${bucket("ks")} AS bucket
       |  FROM probe CROSS JOIN r),
       |est AS (SELECT user_id, CAST(min(coalesce(n, 0)) AS BIGINT) AS est_n
       |  FROM pb LEFT JOIN counters
       |    ON pb.rw = counters.rw AND pb.bucket = counters.bucket
       |  GROUP BY 1),
       |ex AS (SELECT user_id, CAST(count(*) AS BIGINT) AS true_n
       |  FROM k GROUP BY 1)
       |SELECT est.user_id, est_n, true_n, est_n - true_n AS overcount
       |FROM est JOIN ex ON est.user_id = ex.user_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // q118 — join-size estimation from sketches: the AMS inner-product
  // over two CMS counter tables (lineitem.l_partkey × part.p_partkey)
  // vs the exact census-product join size — "will this join explode?"
  // answered from config-sized state, no fact-table scan at decision
  // time. One-sided: the estimate never undercounts. Same portable
  // md5 buckets as q107, so the oracle replays the sketch exactly.
  // ---------------------------------------------------------------
  def q118JoinSizeEstimate(spark: SparkSession, d: String): DataFrame = {
    import graft.operators.Profiling
    val li = Tables.lineitem(spark, d)
    val pa = Tables.part(spark, d)
    val est = Profiling.countMinJoinSize(
      Profiling.countMinCounters(li, col("l_partkey"), CmsDepth, CmsWidth),
      Profiling.countMinCounters(pa, col("p_partkey"), CmsDepth, CmsWidth))
    val exact = Profiling.joinSizeExact(li, col("l_partkey"), pa, col("p_partkey"))
    exact.crossJoin(est).select(
      col("join_size"), col("join_size_estimate"),
      (col("join_size_estimate").cast("double") /
        col("join_size").cast("double")).as("overestimate_ratio"))
  }

  val q118Sql: String = {
    def bucket(keyExpr: String) =
      s"""CAST(CAST(('0x' || substr(md5(CAST(rw AS VARCHAR) || ':' || $keyExpr),
         |    1, 15)) AS UBIGINT) % $CmsWidth AS BIGINT)""".stripMargin
    s"""WITH r AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(rw)),
       |la AS (SELECT CAST(l_partkey AS VARCHAR) AS ks FROM lineitem
       |  WHERE l_partkey IS NOT NULL),
       |pb AS (SELECT CAST(p_partkey AS VARCHAR) AS ks FROM part
       |  WHERE p_partkey IS NOT NULL),
       |ca AS (SELECT rw, ${bucket("ks")} AS bucket, CAST(count(*) AS BIGINT) AS n
       |  FROM la CROSS JOIN r GROUP BY 1, 2),
       |cb AS (SELECT rw, ${bucket("ks")} AS bucket, CAST(count(*) AS BIGINT) AS n
       |  FROM pb CROSS JOIN r GROUP BY 1, 2),
       |estd AS (SELECT ca.rw, CAST(sum(ca.n * cb.n) AS BIGINT) AS s
       |  FROM ca JOIN cb ON ca.rw = cb.rw AND ca.bucket = cb.bucket GROUP BY 1),
       |est AS (SELECT CAST(min(s) AS BIGINT) AS join_size_estimate FROM estd),
       |exa AS (SELECT COALESCE(CAST(sum(x.n * y.n) AS BIGINT), 0) AS join_size
       |  FROM (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n FROM lineitem
       |        WHERE l_partkey IS NOT NULL GROUP BY 1) x
       |  JOIN (SELECT p_partkey AS k, CAST(count(*) AS BIGINT) AS n FROM part
       |        WHERE p_partkey IS NOT NULL GROUP BY 1) y ON x.k = y.k)
       |SELECT join_size, join_size_estimate,
       |  CAST(join_size_estimate AS DOUBLE) / CAST(join_size AS DOUBLE)
       |    AS overestimate_ratio
       |FROM exa CROSS JOIN est""".stripMargin
  }

  // ---------------------------------------------------------------
  // q110 — embedding representation drift: per-dimension mean/stddev
  // of two embedding corpus halves (vec_id parity stands in for
  // before/after an encoder change), with the shift in baseline
  // sigmas and the stddev ratio. Both sides run the q68 fixed-point
  // profile scheme, so every statistic is engine-exact; the oracle
  // restates it with a side key and joins the halves per dim.
  // ---------------------------------------------------------------
  def q110EmbeddingDrift(spark: SparkSession, d: String): DataFrame = {
    val em = Tables.embeddings(spark, d)
    Checks.embeddingDrift(
      current = em.filter(pmod(col("vec_id"), lit(2)) === 1),
      baseline = em.filter(pmod(col("vec_id"), lit(2)) === 0),
      vecCol = "embedding")
  }

  val q110Sql: String =
    """WITH ex AS (
      |  SELECT vec_id,
      |         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
      |         unnest(generate_series(0, len(embedding) - 1)) AS dim
      |  FROM embeddings),
      |qz AS (SELECT vec_id, dim,
      |    CAST(round_even(v * 1e15, 0) AS HUGEINT) AS w FROM ex),
      |prof AS (
      |  SELECT (vec_id % 2) AS side, dim, CAST(count(*) AS BIGINT) AS n,
      |    CAST(CAST(sum(w) AS VARCHAR) AS DOUBLE) / 1e15 AS s,
      |    CAST(CAST(sum(w * w) AS VARCHAR) AS DOUBLE) / 1e30 AS sq
      |  FROM qz GROUP BY 1, 2),
      |st AS (
      |  SELECT side, dim, n, s / CAST(n AS DOUBLE) AS mean,
      |    sqrt(greatest(sq - s * s / CAST(n AS DOUBLE), 0.0)
      |      / (CAST(n AS DOUBLE) - 1.0)) AS sd
      |  FROM prof)
      |SELECT CAST(b.dim AS BIGINT) AS dim, b.n AS n_baseline, c.n AS n_current,
      |  b.mean AS mean_baseline, c.mean AS mean_current,
      |  c.mean - b.mean AS mean_shift,
      |  CASE WHEN b.sd > 0.0 THEN (c.mean - b.mean) / b.sd END AS shift_sigmas,
      |  b.sd AS stddev_baseline, c.sd AS stddev_current,
      |  CASE WHEN b.sd > 0.0 THEN c.sd / b.sd END AS stddev_ratio
      |FROM st b JOIN st c ON b.dim = c.dim AND b.side = 0 AND c.side = 1""".stripMargin

  // ---------------------------------------------------------------
  // q157 — random-projection KS drift ensemble: the rotational-drift
  // catch q110 misses. q110 profiles per-dimension marginals, so an
  // encoder change that ROTATES the embedding space (correlated
  // drift, identical marginals) is invisible to it; projecting both
  // corpus halves onto 8 fixed Rademacher axes and running the exact
  // two-sample KS per axis sees it (Cramér–Wold). The ±1 projection
  // matrix is one Scala computation interpolated as literals into
  // BOTH engines (PoissonOneCdf discipline); the dot is the shared
  // sequential fold (q44's parity); the per-axis KS is q144's exact
  // dag partitioned by axis. Ensemble summary: order-free MAX and a
  // 1e15-quantized order-free mean.
  // ---------------------------------------------------------------
  private val ProjK = 8
  private val ProjDims = 64
  private val ProjSeed = 42L

  def q157ProjectionDriftKs(spark: SparkSession, d: String): DataFrame = {
    val em = Tables.embeddings(spark, d)
    graft.operators.StatTests.randomProjectionKs(
      current = em.filter(pmod(col("vec_id"), lit(2)) === 1),
      baseline = em.filter(pmod(col("vec_id"), lit(2)) === 0),
      vecCol = "embedding", dims = ProjDims, k = ProjK, seed = ProjSeed)
  }

  val q157Sql: String = {
    val m = graft.operators.StatTests.projectionMatrix(ProjDims, ProjK, ProjSeed)
    def wList(j: Int): String =
      m(j).map(w => if (w > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    val branches = (0 until ProjK).map { j =>
      s"""SELECT (vec_id % 2 = 1) AS cur, CAST($j AS BIGINT) AS axis,
         |    list_sum(list_transform(range(1, ${ProjDims + 1}),
         |      i -> CAST(embedding[i] AS DOUBLE) * (${wList(j)})[i])) AS v
         |  FROM embeddings""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH p AS (
       |  $branches),
       |c AS (
       |  SELECT axis, v,
       |    CAST(SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |    CAST(SUM(CASE WHEN cur THEN 0 ELSE 1 END) AS BIGINT) AS nb
       |  FROM p WHERE v IS NOT NULL AND NOT isnan(v) GROUP BY axis, v),
       |t AS (SELECT axis, CAST(SUM(na) AS BIGINT) AS ta,
       |    CAST(SUM(nb) AS BIGINT) AS tb,
       |    CAST(COUNT(*) AS BIGINT) AS nd FROM c GROUP BY axis),
       |w AS (
       |  SELECT axis, v,
       |    CAST(SUM(na) OVER (PARTITION BY axis ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
       |    CAST(SUM(nb) OVER (PARTITION BY axis ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
       |  FROM c),
       |g AS (
       |  SELECT w.axis, w.v,
       |    ABS(CAST(w.ca AS DOUBLE) / CAST(t.ta AS DOUBLE)
       |      - CAST(w.cb AS DOUBLE) / CAST(t.tb AS DOUBLE)) AS gap
       |  FROM w JOIN t ON w.axis = t.axis),
       |m AS (SELECT axis, MAX(gap) AS mx FROM g GROUP BY axis),
       |ax AS (
       |  SELECT t.axis, t.ta AS n_current, t.tb AS n_baseline,
       |    t.nd AS n_distinct_values,
       |    CASE WHEN t.ta > 0 AND t.tb > 0 THEN m.mx END AS ks_stat,
       |    CASE WHEN t.ta > 0 AND t.tb > 0 THEN
       |      (SELECT MIN(v) FROM g WHERE g.axis = t.axis AND g.gap = m.mx)
       |    END AS ks_at,
       |    CASE WHEN t.ta > 0 AND t.tb > 0 THEN
       |      SQRT(CAST(t.ta AS DOUBLE) * CAST(t.tb AS DOUBLE)
       |        / CAST(t.ta + t.tb AS DOUBLE)) * m.mx END AS ks_z
       |  FROM t JOIN m ON t.axis = m.axis),
       |s AS (SELECT MAX(ks_stat) AS ks_ensemble_max,
       |    (CAST(SUM(CAST(round_even(ks_stat * 1e15, 0) AS HUGEINT)) AS DOUBLE)
       |      / 1e15) / ${ProjK}.0 AS ks_ensemble_mean FROM ax)
       |SELECT ax.axis, ax.n_current, ax.n_baseline, ax.n_distinct_values,
       |  ax.ks_stat, ax.ks_at, ax.ks_z, s.ks_ensemble_max, s.ks_ensemble_mean
       |FROM ax CROSS JOIN s""".stripMargin
  }

  // ---------------------------------------------------------------
  // q158 — mergeable quantile sketch (deterministic bottom-k / KMV):
  // bounded-error quantiles whose sketch is a pure function of the
  // input multiset, so merge == single-pass EXACTLY. The engine path
  // deliberately goes split → per-shard sketch → merge (the q105
  // partials discipline) while the oracle computes the single-pass
  // bottom-k directly — the equality IS the merge contract, pinned
  // by the hash compare. Quantile read: value at rank
  // max(1, ceil(p·n)) of the sketch — same dag both engines.
  // ---------------------------------------------------------------
  private val SketchK = 1024
  private val SketchProbs = Seq(0.5, 0.9, 0.99)

  def q158QuantileSketch(spark: SparkSession, d: String): DataFrame = {
    import graft.operators.QuantileSketch
    val ev = Tables.events(spark, d)
    val even = QuantileSketch.sketchPartials(
      ev.filter(col("event_id") % 2 === 0), col("value"), col("event_id"), SketchK)
    val odd = QuantileSketch.sketchPartials(
      ev.filter(col("event_id") % 2 === 1), col("value"), col("event_id"), SketchK)
    QuantileSketch.quantiles(
      QuantileSketch.merge(SketchK, even, odd), SketchProbs)
  }

  val q158Sql: String =
    s"""WITH hv AS (
       |  SELECT CAST(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
       |      AS UBIGINT) AS BIGINT) AS h,
       |    CAST(value AS DOUBLE) AS v
       |  FROM events
       |  WHERE event_id IS NOT NULL AND value IS NOT NULL AND NOT isnan(value)),
       |sk AS (SELECT h, v FROM hv ORDER BY h, v LIMIT $SketchK),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sk),
       |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM sk),
       |pp AS (SELECT unnest([${SketchProbs.mkString(", ")}]) AS p)
       |SELECT pp.p, r.v AS q, nn.n
       |FROM pp CROSS JOIN nn
       |JOIN r ON r.rk = GREATEST(1, CAST(ceil(pp.p * nn.n) AS BIGINT))""".stripMargin

  // ---------------------------------------------------------------
  // q113 — exact per-group quantiles (p50/p90/p99 of event value per
  // event type): the true order statistic at group rank
  // max(1, ceil(p·N)) under the (value, event_id) total order. The
  // oracle states the naive per-group window sort; the engine ranks
  // inside (group, cell) cells so no group ever sorts in one task.
  // Probabilities cross engines as strings (decimal-literal trap).
  // ---------------------------------------------------------------
  private val QuantileProbs = Seq(0.5, 0.9, 0.99)

  def q113GroupQuantiles(spark: SparkSession, d: String): DataFrame =
    graft.operators.Profiling.quantilesByGroup(
      Tables.events(spark, d), col("value"), col("event_id"),
      col("event_type"), QuantileProbs)

  val q113Sql: String = {
    val probsValues = QuantileProbs
      .map(p => s"(CAST('$p' AS DOUBLE))").mkString(", ")
    s"""WITH nn AS (SELECT event_type AS g, value AS v, event_id AS tb
       |  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
       |cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM nn GROUP BY 1),
       |r AS (SELECT g, v,
       |    CAST(row_number() OVER (PARTITION BY g ORDER BY v, tb) AS BIGINT) AS rk
       |  FROM nn),
       |p AS (SELECT * FROM (VALUES $probsValues) t(p)),
       |tg AS (SELECT g, p, n,
       |    greatest(1, CAST(ceil(p * CAST(n AS DOUBLE)) AS BIGINT)) AS target
       |  FROM cnt CROSS JOIN p)
       |SELECT tg.g AS group_key, tg.p AS p, tg.n AS n, r.v AS quantile
       |FROM tg JOIN r ON r.g = tg.g AND r.rk = tg.target""".stripMargin
  }

  // ---------------------------------------------------------------
  // q145 — contingency chi-square census: is the language mix
  // independent of the source? Per (source, lang) cell — observed
  // count, marginals, expected count under independence, chi-square
  // contribution, Pearson residual — over the full rows×cols spine
  // (zero cells carry contribution = expected). Σcontribution is the
  // chi-square statistic with (r−1)(c−1) dof; the per-cell rows say
  // WHICH source/language pairs drive dependence. Counts stay BIGINT
  // end-to-end; expected/contribution/residual are identical fixed
  // IEEE dags in both engines (the q93 Benford convention).
  // ---------------------------------------------------------------
  def q145Contingency(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.contingencyChiSquare(
      Tables.documents(spark, d), col("source"), col("lang"))

  val q145Sql: String =
    """WITH s AS (
      |  SELECT source AS row_key, lang AS col_key FROM documents
      |  WHERE source IS NOT NULL AND lang IS NOT NULL),
      |c AS (SELECT row_key, col_key, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM s GROUP BY row_key, col_key),
      |r AS (SELECT row_key, CAST(SUM(n) AS BIGINT) AS row_total FROM c GROUP BY row_key),
      |cl AS (SELECT col_key, CAST(SUM(n) AS BIGINT) AS col_total FROM c GROUP BY col_key),
      |g AS (SELECT CAST(SUM(n) AS BIGINT) AS grand_total FROM c),
      |j AS (
      |  SELECT r.row_key, cl.col_key, COALESCE(c.n, 0) AS n,
      |    r.row_total, cl.col_total, g.grand_total,
      |    CAST(r.row_total AS DOUBLE) * CAST(cl.col_total AS DOUBLE)
      |      / CAST(g.grand_total AS DOUBLE) AS expected
      |  FROM r CROSS JOIN cl
      |  LEFT JOIN c ON c.row_key = r.row_key AND c.col_key = cl.col_key
      |  CROSS JOIN g)
      |SELECT row_key, col_key, n, row_total, col_total, grand_total, expected,
      |  (CAST(n AS DOUBLE) - expected) * (CAST(n AS DOUBLE) - expected)
      |    / expected AS contribution,
      |  (CAST(n AS DOUBLE) - expected) / SQRT(expected) AS residual
      |FROM j""".stripMargin

  // ---------------------------------------------------------------
  // q161 — Benford first-digit conformance over order totals: the
  // classic fabrication screen. Prices quantized to integer cents
  // HALF-EVEN first (bround·100 — both engines then cast the same
  // integer-valued double; DuckDB's rounding double→bigint cast
  // never sees a fraction), digit from the BIGINT's decimal string
  // (no log10 on the data path), expected p from the shared literal
  // table, chi2/MAD summed order-independently (bround→decimal).
  // ---------------------------------------------------------------
  def q161Benford(spark: SparkSession, d: String): DataFrame =
    graft.operators.Checks.benfordDigits(
      graft.Tables.orders(spark, d),
      bround(col("o_totalprice") * lit(100.0)))

  val q161Sql: String = {
    val bp = graft.operators.Checks.BenfordP.map(_ + "e0")
      .mkString("[", ", ", "]")
    s"""WITH v AS (
       |  SELECT CAST(round_even(o_totalprice * 100.0, 0) AS BIGINT) AS v
       |  FROM orders
       |  WHERE round_even(o_totalprice * 100.0, 0) IS NOT NULL),
       |cnt AS (
       |  SELECT CAST(SUBSTRING(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM v WHERE v > 0 GROUP BY 1),
       |spine AS (
       |  SELECT CAST(d AS INT) AS digit,
       |    list_extract($bp, CAST(d AS INT)) AS expected_p
       |  FROM generate_series(1, 9) t(d)),
       |census AS (
       |  SELECT s.digit, COALESCE(cnt.n, 0) AS n, s.expected_p
       |  FROM spine s LEFT JOIN cnt ON cnt.digit = s.digit),
       |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM census),
       |c AS (
       |  SELECT census.digit, census.n, census.expected_p,
       |    CASE WHEN tot.nn > 0 THEN
       |      CAST(census.n AS DOUBLE) / CAST(tot.nn AS DOUBLE) END AS observed_p,
       |    CASE WHEN tot.nn > 0 THEN
       |      (CAST(census.n AS DOUBLE) - CAST(tot.nn AS DOUBLE) * census.expected_p)
       |      * (CAST(census.n AS DOUBLE) - CAST(tot.nn AS DOUBLE) * census.expected_p)
       |      / (CAST(tot.nn AS DOUBLE) * census.expected_p) END AS chi2_contrib
       |  FROM census CROSS JOIN tot),
       |summ AS (
       |  SELECT
       |    CAST(CAST(SUM(CAST(round_even(chi2_contrib * 1000000000.0, 0)
       |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) / 1000000000.0
       |      AS chi2_stat,
       |    CAST(CAST(SUM(CAST(round_even(ABS(observed_p - expected_p) * 1e15, 0)
       |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) / 1e15 / 9.0 AS mad
       |  FROM c)
       |SELECT c.digit, c.n, c.observed_p, c.expected_p, c.chi2_contrib,
       |  summ.chi2_stat, summ.mad
       |FROM c CROSS JOIN summ""".stripMargin
  }

  // ---------------------------------------------------------------
  // q166 — per-event-type Benford conformance over event values
  // (quantized to cents, the q161 convention): the fabrication
  // screen localized to the stream that produced it — one synthetic
  // or truncated-range event type shows nonconformity the corpus
  // census dilutes away. Group × 9-digit spine, per-group chi2/MAD.
  // ---------------------------------------------------------------
  def q166GroupBenford(spark: SparkSession, d: String): DataFrame =
    graft.operators.Checks.benfordDigitsBy(
      graft.Tables.events(spark, d),
      col("event_type"),
      bround(col("value") * lit(100.0)))
      .withColumnRenamed("group_key", "event_type")

  val q166Sql: String = {
    val bp = graft.operators.Checks.BenfordP.map(_ + "e0")
      .mkString("[", ", ", "]")
    s"""WITH v AS (
       |  SELECT event_type AS g,
       |    CAST(round_even(value * 100.0, 0) AS BIGINT) AS v
       |  FROM events WHERE event_type IS NOT NULL),
       |cnt AS (
       |  SELECT g, CAST(SUBSTRING(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM v WHERE v IS NOT NULL AND v > 0 GROUP BY 1, 2),
       |spine AS (
       |  SELECT CAST(d AS INT) AS digit,
       |    list_extract($bp, CAST(d AS INT)) AS expected_p
       |  FROM generate_series(1, 9) t(d)),
       |census AS (
       |  SELECT gg.g, s.digit, COALESCE(cnt.n, 0) AS n, s.expected_p
       |  FROM (SELECT DISTINCT g FROM cnt) gg
       |  CROSS JOIN spine s
       |  LEFT JOIN cnt ON cnt.g = gg.g AND cnt.digit = s.digit),
       |tot AS (SELECT g, CAST(SUM(n) AS BIGINT) AS nn FROM census GROUP BY g),
       |c AS (
       |  SELECT census.g, census.digit, census.n, census.expected_p,
       |    CASE WHEN tot.nn > 0 THEN
       |      CAST(census.n AS DOUBLE) / CAST(tot.nn AS DOUBLE) END AS observed_p,
       |    CASE WHEN tot.nn > 0 THEN
       |      (CAST(census.n AS DOUBLE) - CAST(tot.nn AS DOUBLE) * census.expected_p)
       |      * (CAST(census.n AS DOUBLE) - CAST(tot.nn AS DOUBLE) * census.expected_p)
       |      / (CAST(tot.nn AS DOUBLE) * census.expected_p) END AS chi2_contrib
       |  FROM census JOIN tot ON census.g = tot.g),
       |summ AS (
       |  SELECT g,
       |    CAST(CAST(SUM(CAST(round_even(chi2_contrib * 1000000000.0, 0)
       |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) / 1000000000.0
       |      AS chi2_stat,
       |    CAST(CAST(SUM(CAST(round_even(ABS(observed_p - expected_p) * 1e15, 0)
       |      AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) / 1e15 / 9.0 AS mad
       |  FROM c GROUP BY g)
       |SELECT c.g AS event_type, c.digit, c.n, c.observed_p, c.expected_p,
       |  c.chi2_contrib, summ.chi2_stat, summ.mad
       |FROM c JOIN summ ON c.g = summ.g""".stripMargin
  }

  // ---------------------------------------------------------------
  // q171 — two-proportion z: the high-value-event rate (value > 200)
  // between the even/odd user split — the A/B-assignment health
  // check (a hash split must NOT move the outcome rate; a small p
  // here means the split machinery is broken). z^2 equals the 2x2
  // chi-square, so this also closes the df=1 chi-square p gap.
  // ---------------------------------------------------------------
  def q171ProportionZ(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.proportionZ(
      graft.Tables.events(spark, d)
        .filter(col("user_id").isNotNull && col("value").isNotNull),
      success = col("value") > lit(200.0),
      inA = pmod(col("user_id"), lit(2L)) === 0L)

  private def propZSql(groupSel: String, groupByKw: String, finalSel: String): String =
    s"""v AS (SELECT $groupSel
       |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS a,
       |    CASE WHEN value > 200.0 THEN 1 ELSE 0 END AS sc
       |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
       |ag AS (SELECT $groupByKw
       |    CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(1 - a) AS BIGINT) AS n_b,
       |    CAST(SUM(a * sc) AS BIGINT) AS s_a,
       |    CAST(SUM((1 - a) * sc) AS BIGINT) AS s_b
       |  FROM v $groupByKw),
       |f AS (SELECT *,
       |    CASE WHEN n_a > 0 THEN CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS rate_a,
       |    CASE WHEN n_b > 0 THEN CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS rate_b,
       |    CASE WHEN n_a + n_b > 0 THEN
       |      CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) END AS pool
       |  FROM ag),
       |g AS (SELECT *,
       |    rate_a - rate_b AS rate_diff,
       |    CASE WHEN n_a > 0 AND n_b > 0
       |      AND pool * (1.0 - pool)
       |        * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) > 0.0
       |    THEN (rate_a - rate_b)
       |      / SQRT(pool * (1.0 - pool)
       |        * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
       |    END AS z
       |  FROM f)
       |SELECT $finalSel n_a, n_b, s_a, s_b, rate_a, rate_b, rate_diff, z,
       |  ${graft.operators.StatTests.normalPTwoSidedSql("z")} AS p_two_sided
       |FROM g""".stripMargin

  val q171Sql: String = s"WITH ${propZSql("", "", "")}"

  // ---------------------------------------------------------------
  // q172 — per-event-type proportion z: the A/B rate check localized
  // to the stream where an assignment bug would hide.
  // ---------------------------------------------------------------
  def q172GroupProportionZ(spark: SparkSession, d: String): DataFrame =
    graft.operators.StatTests.proportionZBy(
      graft.Tables.events(spark, d)
        .filter(col("user_id").isNotNull && col("value").isNotNull),
      group = col("event_type"),
      success = col("value") > lit(200.0),
      inA = pmod(col("user_id"), lit(2L)) === 0L)
      .withColumnRenamed("group_key", "event_type")

  val q172Sql: String =
    s"WITH ${propZSql("event_type AS g,", "GROUP BY g", "g AS event_type,")}"
      .replace("FROM v GROUP BY g),", "FROM v WHERE g IS NOT NULL GROUP BY g),")
      .replace("ag AS (SELECT GROUP BY g", "ag AS (SELECT g,")

  // ---------------------------------------------------------------
  // q173 — Jarque–Bera normality census of event values (cents):
  // exact decimal power sums → skewness/kurtosis/JB and the EXACT
  // chi2(2df) p-value exp(-x/2) via the shared literal grid — the
  // precondition check for every mean/sigma-based monitor.
  // q174 — the same census per event type.
  // ---------------------------------------------------------------
  def q173Normality(spark: SparkSession, d: String): DataFrame =
    graft.operators.Profiling.normalityJarqueBera(
      graft.Tables.events(spark, d),
      bround(col("value") * lit(100.0)))

  def q174GroupNormality(spark: SparkSession, d: String): DataFrame =
    graft.operators.Profiling.normalityJarqueBeraBy(
      graft.Tables.events(spark, d),
      col("event_type"),
      bround(col("value") * lit(100.0)))
      .withColumnRenamed("group_key", "event_type")

  private def jbSql(groupSel: String, groupBy: String, finalSel: String): String = {
    // integer central-moment numerators in HUGEINT (the engine's
    // DECIMAL(38,0) — same integers, same doubles); float tail is
    // fusion-free (see normalityJarqueBera's Scaladoc)
    s"""v AS (SELECT $groupSel
       |    CAST(round_even(value * 100.0, 0) AS BIGINT) AS v
       |  FROM events WHERE round_even(value * 100.0, 0) IS NOT NULL$$groupWhere),
       |g0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0,
       |    CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS t1 FROM v),
       |shf AS (SELECT n0, t1,
       |    CAST(FLOOR(CAST(t1 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS BIGINT) AS m0
       |  FROM g0),
       |ag AS (SELECT $groupSel CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(v.v - shf.m0 AS HUGEINT)) AS HUGEINT) AS s1,
       |    CAST(SUM(CAST(v.v - shf.m0 AS HUGEINT) * (v.v - shf.m0)) AS HUGEINT) AS s2,
       |    CAST(SUM(CAST(v.v - shf.m0 AS HUGEINT) * (v.v - shf.m0) * (v.v - shf.m0)) AS HUGEINT) AS s3,
       |    CAST(SUM(CAST(v.v - shf.m0 AS HUGEINT) * (v.v - shf.m0) * (v.v - shf.m0) * (v.v - shf.m0)) AS HUGEINT) AS s4,
       |    MAX(shf.m0) AS m0, MAX(shf.t1) AS t1, MAX(shf.n0) AS n0
       |  FROM v CROSS JOIN shf $groupBy),
       |num AS (SELECT *,
       |    CAST(n AS HUGEINT) * s2 - s1 * s1 AS m2n,
       |    CAST(n AS HUGEINT) * n * s3
       |      - 3 * CAST(n AS HUGEINT) * s1 * s2
       |      + 2 * s1 * s1 * s1 AS m3n,
       |    CAST(n AS HUGEINT) * n * n * s4
       |      - 4 * CAST(n AS HUGEINT) * n * s1 * s3
       |      + 6 * CAST(n AS HUGEINT) * s1 * s1 * s2
       |      - 3 * s1 * s1 * s1 * s1 AS m4n
       |  FROM ag),
       |mm AS (SELECT *,
       |    $$meanExpr AS mean,
       |    CAST(m2n AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS m2
       |  FROM num),
       |sh AS (SELECT *,
       |    CASE WHEN m2 > 0.0 THEN
       |      (CAST(m3n AS DOUBLE)
       |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
       |      / (m2 * SQRT(m2)) END AS skewness,
       |    CASE WHEN m2 > 0.0 THEN
       |      (CAST(m4n AS DOUBLE)
       |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
       |           * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
       |      / (m2 * m2) END AS kurtosis
       |  FROM mm),
       |j AS (SELECT *,
       |    CASE WHEN skewness IS NOT NULL AND kurtosis IS NOT NULL THEN
       |      (CAST(n AS DOUBLE) / 6.0) *
       |        (CAST(CAST(round_even(skewness * skewness * 1e9, 0) AS DECIMAL(38,0))
       |          + CAST(round_even((kurtosis - 3.0) * (kurtosis - 3.0) / 4.0 * 1e9, 0)
       |              AS DECIMAL(38,0)) AS DOUBLE) / 1e9) END AS jb_stat
       |  FROM sh)
       |SELECT $finalSel n, mean, m2, skewness, kurtosis, jb_stat,
       |  ${graft.operators.StatTests.chi2Df2PValueSql("jb_stat")} AS p_value
       |FROM j""".stripMargin
      .replace("$groupWhere", if (groupSel.isEmpty) "" else " AND event_type IS NOT NULL")
      .replace("$meanExpr",
        if (groupSel.isEmpty) "CAST(t1 AS DOUBLE) / CAST(n0 AS DOUBLE)"
        else "CAST(m0 AS DOUBLE) + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)")
  }

  val q173Sql: String = s"WITH ${jbSql("", "", "")}"
  val q174Sql: String =
    s"WITH ${jbSql("event_type AS g,", "GROUP BY g", "g AS event_type,")}"
      .replace("ag AS (SELECT event_type AS g, CAST", "ag AS (SELECT g, CAST")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q161_benford" -> (q161Benford _),
    "q171_proportion_z" -> (q171ProportionZ _),
    "q173_normality_jb" -> (q173Normality _),
    "q174_group_normality_jb" -> (q174GroupNormality _),
    "q172_group_proportion_z" -> (q172GroupProportionZ _),
    "q166_group_benford" -> (q166GroupBenford _),
    "q145_contingency_chi2" -> (q145Contingency _),
    "q101_key_skew" -> (q101KeySkew _),
    "q107_cms_counts" -> (q107CmsCounts _),
    "q118_join_size_estimate" -> (q118JoinSizeEstimate _),
    "q110_embedding_drift" -> (q110EmbeddingDrift _),
    "q157_projection_drift_ks" -> (q157ProjectionDriftKs _),
    "q158_quantile_sketch" -> (q158QuantileSketch _),
    "q113_group_quantiles" -> (q113GroupQuantiles _),
    "q106_quantile_drift" -> (q106QuantileDrift _),
    "q116_hist_quantiles" -> (q116HistQuantiles _),
    "q117_group_hist_quantiles" -> (q117GroupHistQuantiles _),
    "q102_eqfreq_bins" -> (q102EqFreqBins _),
    "q99_suppress_under_k" -> (q99SuppressUnderK _),
    "q98_privacy_census" -> (q98PrivacyCensus _),
    "q96_class_balance" -> (q96ClassBalance _),
    "q93_benford" -> (q93Benford _),
    "q94_order_inversions" -> (q94OrderInversions _),
    "q22_completeness" -> (q22Completeness _),
    "q23_uniqueness"   -> (q23Uniqueness _),
    "q24_referential_integrity" -> (q24ReferentialIntegrity _),
    "q25_value_bounds" -> (q25ValueBounds _),
    "q52_categorical_drift" -> (q52CategoricalDrift _),
    "q53_numeric_drift" -> (q53NumericDrift _),
    "q55_column_profile" -> (q55Profile _),
    "q55b_string_profile" -> (q55bStringProfile _),
    "q72_robust_outliers" -> (q72RobustOutliers _),
    "q74_winsorize" -> (q74Winsorize _),
    "q77_merkle_recon" -> (q77MerkleRecon _),
    "q79_histogram" -> (q79Histogram _),
    "q81_inclusion" -> (q81Inclusion _),
    "q83_volume_anomalies" -> (q83VolumeAnomalies _),
    "q84_validation_report" -> (q84ValidationReport _),
    "q85_fd_report" -> (q85FdReport _),
    "q89_float_audit" -> (q89FloatAudit _),
    "q90_seasonal_volume" -> (q90SeasonalVolume _),
    "q91_group_histogram" -> (q91GroupHistogram _))

  val oracleSql: Map[String, String] = Map(
    "q161_benford" -> q161Sql,
    "q171_proportion_z" -> q171Sql,
    "q173_normality_jb" -> q173Sql,
    "q174_group_normality_jb" -> q174Sql,
    "q172_group_proportion_z" -> q172Sql,
    "q166_group_benford" -> q166Sql,
    "q145_contingency_chi2" -> q145Sql,
    "q101_key_skew" -> q101Sql,
    "q107_cms_counts" -> q107Sql,
    "q118_join_size_estimate" -> q118Sql,
    "q110_embedding_drift" -> q110Sql,
    "q157_projection_drift_ks" -> q157Sql,
    "q158_quantile_sketch" -> q158Sql,
    "q113_group_quantiles" -> q113Sql,
    "q106_quantile_drift" -> q106Sql,
    "q116_hist_quantiles" -> q116Sql,
    "q117_group_hist_quantiles" -> q117Sql,
    "q102_eqfreq_bins" -> q102Sql,
    "q99_suppress_under_k" -> q99Sql,
    "q98_privacy_census" -> q98Sql,
    "q96_class_balance" -> q96Sql,
    "q93_benford" -> q93Sql,
    "q94_order_inversions" -> q94Sql,
    "q22_completeness" -> q22Sql,
    "q23_uniqueness"   -> q23Sql,
    "q24_referential_integrity" -> q24Sql,
    "q25_value_bounds" -> q25Sql,
    "q52_categorical_drift" -> q52Sql,
    "q53_numeric_drift" -> q53Sql,
    "q55_column_profile" -> q55Sql,
    "q55b_string_profile" -> q55bSql,
    "q72_robust_outliers" -> q72Sql,
    "q74_winsorize" -> q74Sql,
    "q77_merkle_recon" -> q77Sql,
    "q79_histogram" -> q79Sql,
    "q81_inclusion" -> q81Sql,
    "q83_volume_anomalies" -> q83Sql,
    "q84_validation_report" -> q84Sql,
    "q85_fd_report" -> q85Sql,
    "q89_float_audit" -> q89Sql,
    "q90_seasonal_volume" -> q90Sql,
    "q91_group_histogram" -> q91Sql)
}
