package graft.operators

import graft.CacheLifecycle.FreshPersist
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus: BM25-family relevance
  * scoring for a literal query-term set, top-k by score.
  *
  * Shape: the query terms are config-sized literals, so per-document
  * term frequencies are PER-ROW array expressions (no explode, no
  * token shuffle); corpus statistics (N, average length, per-term
  * document frequencies) are one single-row aggregate broadcast back
  * via cross join — the reference's scalar-subquery pattern (SURVEY
  * §4.2 J2). The only real shuffle is the final top-k, which plans as
  * TakeOrderedAndProject. At warehouse scale the statistics row comes
  * from a maintained stats table instead of a same-query aggregate;
  * the scoring pass is unchanged.
  *
  * The idf factor is the plain ratio N/df rather than the usual
  * log((N−df+0.5)/(df+0.5)): every operation stays IEEE +,*,/ with a
  * fixed association, so results are bit-reproducible across engines
  * (DuckDB oracle included) — transcendental libm calls are the one
  * thing two engines won't agree on to the last ulp. Ranking behavior
  * is the same monotone-in-rarity shape.
  */
object Retrieval {

  /** Whitespace tokens of lowercased text — matches the tokenizer
    * used across TextAnalysis so tf/df statistics line up.
    */
  private def toks(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\S+"), lit(0))

  /** Top-k documents for `terms`: (id, score, per-term tf columns).
    * Documents matching no term score 0 and are ranked by id among
    * themselves; pass `minScore > 0` to drop them instead.
    */
  def bm25TopK(
      df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      minScore: Double = 0.0): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32,
      "query terms are a config-sized literal list")
    val t = toks(col(textCol))
    // per-row: document length + one tf column per term (array filter
    // over the token array — linear per row, codegen'd, no explode)
    def tfCol(term: String): Column =
      size(filter(t, x => x === lit(term))).cast("bigint")
    // perDoc feeds BOTH the stats aggregate and the scoring scan of
    // the same plan; without the persist the tokenizer and per-term
    // filters (the dominant per-row cost) run twice. Released after
    // the returned plan's first execution.
    val perDoc = df.select(
      (col(idCol).as("id") +: size(t).cast("bigint").as("_len") +:
        terms.zipWithIndex.map { case (term, i) => tfCol(term).as(s"_tf$i") }): _*)
      .persistFresh()
    // one corpus-statistics row: N, total length, per-term df
    val statCols = count(lit(1)).as("_n") +: sum(col("_len")).as("_sumlen") +:
      terms.indices.map(i =>
        sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"_df$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    // score: Σ_t (N/df_t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen));
    // fixed left-to-right association so the oracle reproduces it exactly
    val avglen = col("_sumlen").cast("double") / col("_n").cast("double")
    def termScore(i: Int): Column = {
      val tf = col(s"_tf$i").cast("double")
      val idf = col("_n").cast("double") / col(s"_df$i").cast("double")
      when(col(s"_df$i") > 0 && col(s"_tf$i") > 0,
        idf * (tf * lit(k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_len").cast("double") / avglen)))
        .otherwise(lit(0.0))
    }
    val score = terms.indices.map(termScore).reduce(_ + _)
    val out = perDoc.crossJoin(stats)
      .select((col("id").as(idCol) +: score.as("score") +:
        terms.indices.map(i => col(s"_tf$i").as(s"tf_${terms(i)}"))): _*)
      .filter(col("score") >= minScore)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
    graft.CacheLifecycle.releaseAfterFirstUse(Seq(perDoc))
    out
  }
}
