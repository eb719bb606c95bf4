package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Layout, Skew}

/** Scale-mechanics queries: the operators whose whole point is the
  * 100 TB plan shape, pinned by oracles on the same semantics.
  *
  *  - q36: exact distinct count over a skewed key, computed with
  *    value-hash salting (two-level aggregation). The oracle is the
  *    plain COUNT(DISTINCT …) — identical answers, structurally
  *    skew-proof plan (PlanShapeSpec asserts the two-level split).
  *  - q37: date-partitioned at-rest layout + partition pruning: the
  *    events table is written `partitionBy(event_date)` and read
  *    back through a partition filter; only the matching directory
  *    is scanned (PlanShapeSpec asserts exactly one selected
  *    partition). The oracle recomputes from the flat parquet.
  */
object ScaleQueries {

  def q36SaltedDistinct(spark: SparkSession, d: String): DataFrame =
    Skew.saltedDistinctCount(
      Tables.events(spark, d), Seq("event_type"), "user_id", nSalts = 8)

  val q36Sql: String =
    """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_count
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------

  private val PruneDate = "2024-01-05"

  /** Events rewritten date-partitioned (one file per date via a
    * pre-write repartition on the partition column), per-process
    * scratch dir under target/.
    */
  private[graft] def partitionedEventsDir(d: String): String =
    s"target/prune/pid-${ProcessHandle.current().pid()}/${d.replaceAll("[^A-Za-z0-9.]", "_")}/events_by_date"

  private[graft] def writePartitionedEvents(spark: SparkSession, d: String): String = {
    val dir = partitionedEventsDir(d)
    Tables.events(spark, d)
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    dir
  }

  /** Materialize the partitioned layout at most once per process (the
    * dir is per-pid scratch, so a present _SUCCESS marker means this
    * process already wrote it). Lets the bench pay the write in setup
    * and time q37 as what it is: a pruned read.
    */
  private[graft] def ensurePartitionedEvents(spark: SparkSession, d: String): String = {
    val dir = partitionedEventsDir(d)
    if (new java.io.File(dir, "_SUCCESS").exists()) dir
    else writePartitionedEvents(spark, d)
  }

  def q37PartitionPruning(spark: SparkSession, d: String): DataFrame = {
    val dir = ensurePartitionedEvents(spark, d)
    spark.read.parquet(dir)
      .filter(col("event_date") === to_date(lit(PruneDate)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("record_count"), max(col("ts")).as("max_ts"))
  }

  val q37Sql: String =
    s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS record_count,
       |  CAST(MAX(ts) AS TIMESTAMP) AS max_ts
       |FROM events WHERE CAST(ts AS DATE) = DATE '$PruneDate'
       |GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q69 — Z-order (Morton) clustering value over (user_id, day):
  // the multi-dimensional layout key `Layout.writeClustered` sorts
  // by. The oracle states the identical mask-shift interleave —
  // generated from the SAME constant table (`Layout.spreadSql`), so
  // engine and oracle cannot drift. Pure per-row integer ops.
  // ---------------------------------------------------------------

  def q69Zorder(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(col("event_id"), col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).cast("long").as("day"))
      .withColumn("zvalue", Layout.zorder2(col("user_id"), col("day")))

  val q69Sql: String = {
    val sx = Layout.spreadSql("user_id")
    val sy = Layout.spreadSql("day")
    s"""WITH b AS (
       |  SELECT event_id, user_id,
       |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
       |  FROM events)
       |SELECT event_id, user_id, day,
       |  CAST(($sx) | (($sy) << 1) AS BIGINT) AS zvalue
       |FROM b""".stripMargin
  }

  // ---------------------------------------------------------------
  // q82 — join-skew diagnosis: the per-key frequency/contribution
  // census you run BEFORE a big join to decide whether it needs
  // salting. lineitem ⋈ part on partkey, 20 hottest keys by output
  // contribution (deterministic key tiebreak). The plan is two
  // partial-aggregated censuses + TakeOrderedAndProject — no global
  // sort at any scale.
  // ---------------------------------------------------------------
  private val SkewTopK = 20

  def q82JoinSkew(spark: SparkSession, d: String): DataFrame =
    Skew.joinSkewReport(
      Tables.lineitem(spark, d), col("l_partkey"),
      Tables.part(spark, d), col("p_partkey"), SkewTopK)

  val q82Sql: String =
    s"""WITH l AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n_left
       |           FROM lineitem GROUP BY 1),
       |r AS (SELECT p_partkey AS k, CAST(count(*) AS BIGINT) AS n_right
       |      FROM part GROUP BY 1)
       |SELECT k, COALESCE(n_left, 0) AS n_left, COALESCE(n_right, 0) AS n_right,
       |  COALESCE(n_left, 0) * COALESCE(n_right, 0) AS n_output
       |FROM l FULL JOIN r USING (k)
       |ORDER BY n_output DESC, k LIMIT $SkewTopK""".stripMargin

  // ---------------------------------------------------------------
  // q108 — bucketed co-located join: orders and customer written
  // hash-bucketed on the customer key (Layout.writeBucketed), then
  // joined and rolled up per market segment. Functionally the plain
  // join the oracle states; structurally the join runs with NO
  // shuffle on either side — the at-rest bucket layout is the hash
  // partitioning (PlanShapeSpec pins zero Exchanges under the join).
  // The write is per-process setup (the q37 convention), so the
  // bench times what repeats at 100 TB: the shuffle-free read.
  // ---------------------------------------------------------------
  private val JoinBuckets = 8

  /** Bucketed copies of orders/customer, written at most once per
    * (process, sf dir); returns the catalog table names. */
  private[graft] def ensureBucketedTables(
      spark: SparkSession, d: String): (String, String) = {
    val suf = d.replaceAll("[^A-Za-z0-9]", "_")
    val (ot, ct) = (s"graft_bkt_orders_$suf", s"graft_bkt_customer_$suf")
    if (!spark.catalog.tableExists(ot) || !spark.catalog.tableExists(ct)) {
      val base =
        s"target/buckets/pid-${ProcessHandle.current().pid()}/$suf"
      Layout.writeBucketed(
        Tables.orders(spark, d), ot, s"$base/orders", "o_custkey", JoinBuckets)
      Layout.writeBucketed(
        Tables.customer(spark, d), ct, s"$base/customer", "c_custkey", JoinBuckets)
    }
    (ot, ct)
  }

  def q108BucketedJoin(spark: SparkSession, d: String): DataFrame = {
    val (ot, ct) = ensureBucketedTables(spark, d)
    spark.table(ot)
      .join(spark.table(ct), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(bround(col("o_totalprice") * 100).cast("long")).as("revenue_cents"))
  }

  val q108Sql: String =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(round_even(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q111 — zone-map pruning estimate: predicted scan cost of a ts
  // range over the date-partitioned events layout, answered from the
  // file manifest alone (files, not data). The scratch layout is one
  // file per date (the q37 write), so the oracle's per-date groups
  // ARE the files; the envelope test and skip fractions mirror
  // expression-for-expression.
  // ---------------------------------------------------------------
  private val PruneLo = "2024-01-05 00:00:00"
  private val PruneHi = "2024-01-07 12:00:00"

  def q111PruningEstimate(spark: SparkSession, d: String): DataFrame = {
    val dir = ensurePartitionedEvents(spark, d)
    val manifest = graft.operators.Provenance.fileManifest(
      spark.read.parquet(dir), Seq("ts"))
    graft.operators.Provenance.pruningEstimate(manifest, "ts",
      to_timestamp(lit(PruneLo)), to_timestamp(lit(PruneHi)))
  }

  val q111Sql: String =
    s"""WITH f AS (
       |  SELECT CAST(ts AS DATE) AS dt, CAST(count(*) AS BIGINT) AS n_rows,
       |    min(CAST(ts AS TIMESTAMP)) AS mn, max(CAST(ts AS TIMESTAMP)) AS mx
       |  FROM events GROUP BY 1),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS n_files,
       |    CAST(sum(CASE WHEN mx >= TIMESTAMP '$PruneLo'
       |      AND mn <= TIMESTAMP '$PruneHi' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_files_scanned,
       |    CAST(sum(n_rows) AS BIGINT) AS n_rows_total,
       |    CAST(sum(CASE WHEN mx >= TIMESTAMP '$PruneLo'
       |      AND mn <= TIMESTAMP '$PruneHi' THEN n_rows ELSE 0 END) AS BIGINT)
       |      AS n_rows_scanned
       |  FROM f)
       |SELECT n_files, n_files_scanned, n_rows_total, n_rows_scanned,
       |  1.0 - CAST(n_files_scanned AS DOUBLE) / CAST(n_files AS DOUBLE)
       |    AS file_skip_fraction,
       |  1.0 - CAST(n_rows_scanned AS DOUBLE) / CAST(n_rows_total AS DOUBLE)
       |    AS row_skip_fraction
       |FROM t""".stripMargin

  // ---------------------------------------------------------------
  // q115 — link-graph importance (integer fixed-point PageRank) over
  // the customer↔supplier purchase graph: 3 damped rounds in integer
  // micro-units, so an ITERATIVE graph algorithm hash-matches the
  // oracle exactly (every op is long arithmetic — no double sums, no
  // order sensitivity). The oracle unrolls the three rounds as CTEs
  // with the identical div/truncation rule; DuckDB's `//` and
  // Spark's `div` agree on the all-positive ranks here.
  // ---------------------------------------------------------------
  def q115PageRank(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"))
    // distinct on the NARROW integer pair, strings built after: the
    // dedup shuffle moves two longs per row instead of two strings
    // (guide §2.3, narrower types), and the map-side hash is over ints.
    // Same edge set: (custkey, suppkey) -> ("c:"+ck, "s:"+sk) is
    // injective, so distinct-then-concat == concat-then-distinct.
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct()
    val raw = pairs.select(
      concat(lit("c:"), col("ck").cast("string")).as("a"),
      concat(lit("s:"), col("sk").cast("string")).as("b"))
    // symmetrize: importance flows both ways in a bipartite purchase
    // graph (and no node dangles). The union is distinct by
    // construction ("c:" / "s:" namespaces are disjoint), so the
    // operator's own dedup shuffle is skipped (edgesDistinct).
    val edges = raw.union(raw.select(col("b").as("a"), col("a").as("b")))
    graft.operators.Graph.pageRankInt(edges, col("a"), col("b"), iterations = 3,
      edgesDistinct = true)
  }

  val q115Sql: String = {
    def contrib(prev: String, i: Int): String =
      s"""c$i AS (SELECT e.dst AS node, CAST(sum(r.rank // dg.d) AS BIGINT) AS s
         |  FROM e JOIN $prev r ON e.src = r.node JOIN deg dg ON e.src = dg.src
         |  GROUP BY 1),
         |r$i AS (SELECT n.node,
         |    CAST(150000 + (850 * COALESCE(c.s, 0)) // 1000 AS BIGINT) AS rank
         |  FROM n LEFT JOIN c$i c ON n.node = c.node)""".stripMargin
    s"""WITH raw AS (
       |  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS a,
       |    's:' || CAST(l_suppkey AS VARCHAR) AS b
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS (SELECT a AS src, b AS dst FROM raw
       |      UNION SELECT b, a FROM raw),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
       |n AS (SELECT DISTINCT src AS node FROM e),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM n),
       |${contrib("r0", 1)},
       |${contrib("r1", 2)},
       |${contrib("r2", 3)}
       |SELECT node, rank FROM r3""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_salted_distinct"   -> (q36SaltedDistinct _),
    "q37_partition_pruning" -> (q37PartitionPruning _),
    "q69_zorder_key"        -> (q69Zorder _),
    "q82_join_skew"         -> (q82JoinSkew _),
    "q108_bucketed_join"    -> (q108BucketedJoin _),
    "q111_pruning_estimate" -> (q111PruningEstimate _),
    "q115_pagerank"         -> (q115PageRank _))

  val oracleSql: Map[String, String] = Map(
    "q36_salted_distinct"   -> q36Sql,
    "q37_partition_pruning" -> q37Sql,
    "q69_zorder_key"        -> q69Sql,
    "q82_join_skew"         -> q82Sql,
    "q108_bucketed_join"    -> q108Sql,
    "q111_pruning_estimate" -> q111Sql,
    "q115_pagerank"         -> q115Sql)
}
