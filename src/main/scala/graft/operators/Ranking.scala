package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation: score a candidate RUN (what an ANN
  * index / BM25 stage actually returned) against ground TRUTH (the
  * relevant set — for an ANN index, the brute-force top-k). The
  * operators that answer "how much recall did the IVF shortcut cost?"
  * and "did the cheap retriever rank the right things first?" before
  * anyone trusts an approximate index to mine 100 TB.
  *
  * Engine-exact discipline (the [[Evaluation]] convention): hit counts
  * and ranks are integers, DCG masses are integer products against a
  * shared literal discount table, and every emitted metric is a single
  * correctly-rounded IEEE division over exactly-derived operands —
  * stated identically in the DuckDB oracle, so a distributed run
  * hash-matches a single-node engine.
  *
  * Scale shape: both inputs are retrieval OUTPUTS — ≤ candidates rows
  * per query (config-sized candidate lists, k·|queries| rows total),
  * not corpus-scale. Rank windows partition by query_id: |queries|-way
  * parallel, each task sorting one candidate list. Nothing here ever
  * touches the corpus the run was mined from.
  */
object Ranking {

  /** Per-query retrieval quality at cutoff `k`: hits, precision@k,
    * recall@k, the rank of the first relevant result, and its
    * reciprocal (the MRR contribution).
    *
    * `run`: (queryCol, itemCol, scoreCol) candidate rows — ranked
    * internally by (score DESC, item ASC), so callers pass raw scored
    * candidates and the cutoff/tiebreak convention lives in ONE place.
    * `truth`: (queryCol, itemCol) relevant pairs.
    *
    * Output: one row per query PRESENT IN TRUTH (left-joined to the
    * run, so a query the index lost entirely still reports hits=0 —
    * dropping it would silently inflate every macro average):
    * (query_id, n_rel, n_ret, hits, precision_at_k, recall_at_k,
    * first_rel_rank, rr). precision@k divides by the CUTOFF `k` (the
    * standard convention: returning fewer than k candidates is the
    * index's failure, not a smaller denominator); first_rel_rank/rr
    * are NULL when no relevant item is retrieved. Run rows for
    * queries absent from the truth are ignored (no relevance
    * judgments — unjudged, not wrong).
    */
  def retrievalQuality(
      run: DataFrame, truth: DataFrame,
      queryCol: String, itemCol: String, scoreCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ranked = rankRun(run, queryCol, itemCol, scoreCol, k)
    // relevant set per query: collapse duplicate judgments first so a
    // double-entered pair can't double-count hits or n_rel
    val rel = truth.select(col(queryCol).as("query_id"),
      col(itemCol).as("_item")).distinct()
    val relPerQuery = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    val hits = ranked
      .join(rel.withColumn("_rel", lit(1L)), Seq("query_id", "_item"), "left")
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_ret"),
        sum(coalesce(col("_rel"), lit(0L))).as("hits"),
        min(when(col("_rel").isNotNull, col("_rank"))).cast("long")
          .as("first_rel_rank"))
    relPerQuery.join(hits, Seq("query_id"), "left")
      .select(
        col("query_id"), col("n_rel"),
        coalesce(col("n_ret"), lit(0L)).as("n_ret"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("precision_at_k"),
        (coalesce(col("hits"), lit(0L)).cast("double")
          / col("n_rel").cast("double")).as("recall_at_k"),
        col("first_rel_rank"),
        when(col("first_rel_rank").isNotNull,
          lit(1.0) / col("first_rel_rank").cast("double")).as("rr"))
  }

  /** Quantized DCG discount table for ranks 1..k: floor(10¹² / log₂(r+1))
    * as LONG literals. One Scala computation feeds BOTH the engine plan
    * and the oracle SQL (interpolated as digit literals), so the two
    * sides share identical integers by construction — the
    * [[Evaluation.PoissonOneCdf]] shared-literal discipline. Integer
    * discounts make each query's DCG an exact integer sum (order-free,
    * associative), where a per-rank DOUBLE discount would make the sum
    * depend on Spark's reduction order.
    */
  def discountsQ(k: Int): Seq[Long] = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    (1 to k).map(r => math.floor(1e12 / (math.log(r + 1.0) / math.log(2.0))).toLong)
  }

  /** Per-query nDCG@k of a run against GRADED truth: how well the run
    * ordered what it retrieved, not just whether it retrieved it —
    * recall@k treats a relevant hit at rank 1 and rank k the same;
    * nDCG does not. `truth` carries an integer `gainCol` (graded
    * relevance; for ANN-vs-brute ground truth, `k+1 − brute_rank`
    * grades the true top-k). Items retrieved but absent from the
    * truth gain 0.
    *
    * DCG_q = Σ_{r ≤ k} gain(item at rank r) · discount_q(r) — an
    * integer sum of integer products ([[discountsQ]]). IDCG_q ranks
    * the query's OWN truth gains descending (item-ascending tiebreak)
    * against the same discounts — so nDCG = 1 means "ordered exactly
    * as well as the ideal ordering of what the judgments say exists".
    * The single division CAST(dcg)/CAST(idcg) is the only float.
    *
    * Output: one row per query present in truth — (query_id, dcg_q,
    * idcg_q, ndcg); ndcg NULL when idcg_q = 0 (no positive gains
    * to rank — undefined, not 0). Gains must be non-negative; NULL
    * gains are treated as 0.
    */
  def ndcgAtK(
      run: DataFrame, truth: DataFrame,
      queryCol: String, itemCol: String, scoreCol: String, gainCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val W = org.apache.spark.sql.expressions.Window
    val disc = discountsQ(k)
    def discountOf(rank: Column): Column =
      disc.zipWithIndex.foldLeft(Option.empty[Column]) {
        case (None, (d, i)) => Some(when(rank === (i + 1), lit(d)))
        case (Some(c), (d, i)) => Some(c.when(rank === (i + 1), lit(d)))
      }.get.otherwise(lit(0L))
    val ranked = rankRun(run, queryCol, itemCol, scoreCol, k)
    val gains = truth.select(col(queryCol).as("query_id"),
      col(itemCol).as("_item"), coalesce(col(gainCol), lit(0L)).as("_gain"))
    val dcg = ranked
      .join(gains, Seq("query_id", "_item"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("_gain"), lit(0L)).cast("decimal(38,0)") *
        discountOf(col("_rank")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("dcg_q"))
    val wIdeal = W.partitionBy(col("query_id"))
      .orderBy(col("_gain").desc, col("_item").asc)
    val idcg = gains
      .withColumn("_irank", row_number().over(wIdeal))
      .filter(col("_irank") <= k)
      .groupBy(col("query_id"))
      .agg(sum(col("_gain").cast("decimal(38,0)") *
        discountOf(col("_irank")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("idcg_q"))
    // DCG masses accumulate in decimal but EMIT as LONG: bounded by
    // k·g_max·10¹², which fits for any sane cutoff/grade (k=1000,
    // g_max=100 → 10¹⁷ < 2⁶³) — and a LONG column schema-matches the
    // oracle's BIGINT where a decimal would not
    idcg.join(dcg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("dcg_q"), lit(0L).cast("decimal(38,0)")).cast("long")
          .as("dcg_q"),
        col("idcg_q").cast("long").as("idcg_q"),
        when(col("idcg_q") > 0,
          coalesce(col("dcg_q"), lit(0L).cast("decimal(38,0)")).cast("double")
            / col("idcg_q").cast("double")).as("ndcg"))
  }

  /** Macro summary over a [[retrievalQuality]] table: query counts
    * plus mean precision@k / recall@k / MRR, exact and order-free —
    * each per-query metric is a rational hits/denominator, so the
    * macro mean folds as a DECIMAL sum of 10¹²-quantized integer
    * divisions ([[Evaluation.averagePrecisionExact]]'s discipline),
    * never a float sum whose value depends on partition order. The
    * final /(10¹²·n_queries) divisions are the only floats, stated
    * identically in the oracle. Queries with no relevant retrieved
    * contribute rr = 0 to MRR (the standard convention — an index
    * that misses entirely is penalized, not excluded).
    */
  def retrievalSummary(perQuery: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // each `div` yields a ≤ 10¹² LONG (hits ≤ k ≤ n_rel·anything,
    // 1/rank ≤ 1); the CAST to decimal happens BEFORE the sum so the
    // accumulator never wraps even at 10¹⁰ queries
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_hit"),
      sum(expr(s"CAST((CAST(hits AS DECIMAL(38,0)) * 1000000000000) div $k AS DECIMAL(38,0))"))
        .cast("decimal(38,0)").as("_pq"),
      sum(expr("CAST((CAST(hits AS DECIMAL(38,0)) * 1000000000000) div n_rel AS DECIMAL(38,0))"))
        .cast("decimal(38,0)").as("_rq"),
      sum(coalesce(
        expr("CAST(CAST(1000000000000 AS DECIMAL(38,0)) div first_rel_rank AS DECIMAL(38,0))"),
        lit(0L).cast("decimal(38,0)")))
        .cast("decimal(38,0)").as("_mq"))
      .select(col("n_queries"), col("n_hit"),
        (col("_pq").cast("double") /
          (lit(1.0e12) * col("n_queries").cast("double"))).as("mean_precision_at_k"),
        (col("_rq").cast("double") /
          (lit(1.0e12) * col("n_queries").cast("double"))).as("mean_recall_at_k"),
        (col("_mq").cast("double") /
          (lit(1.0e12) * col("n_queries").cast("double"))).as("mrr"))
  }

  /** Rank a run's candidate rows within each query by (score DESC,
    * item ASC) and keep the top `k` — the one place the cutoff and
    * tiebreak convention is defined. Window partitions by query:
    * |queries|-way parallel over config-sized candidate lists.
    */
  private def rankRun(
      run: DataFrame, queryCol: String, itemCol: String, scoreCol: String,
      k: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("query_id"))
      .orderBy(col("_score").desc, col("_item").asc)
    run.select(col(queryCol).as("query_id"), col(itemCol).as("_item"),
        col(scoreCol).as("_score"))
      .withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= k)
  }
}
