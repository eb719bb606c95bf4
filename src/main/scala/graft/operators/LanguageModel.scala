package graft.operators

import graft.AdaptiveCache.CensusPersist
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{BpeVocab, FixedPointLog, Log2FpQ16}

/** CCNet-style n-gram language-model quality gate: a word-trigram
  * Stupid Backoff model (Brants et al. 2007, "Large Language Models
  * in Machine Translation") trained on a clean slice with one census
  * pass, then a per-document log-probability score — the standard
  * pretraining quality filter the linear gate (q112) doesn't cover:
  * the LM catches scrambled/gibberish word ORDER that per-document
  * surface ratios can't see.
  *
  * Stupid Backoff (score, not a normalized probability):
  *   S(w | a b) = c(a b w)/c(a b ·)        if the trigram was seen
  *              = 0.4 · c(b w)/c(b ·)      else if the bigram was
  *              = 0.4² · c(w)/N            else if the word was
  *              = 0.4² · 1/N               else (unknown word)
  * with ⟨s⟩⟨s⟩ padding so a document's first words score against
  * start-of-text context. All context denominators are the grouped
  * counts of the SAME gram relation (c(a b ·) = Σ_w c(a b w)), so
  * every ratio is a pair of exact integers.
  *
  * Portability: log₂ scores live on the hashed surface as EXACT Q16
  * integers via [[FixedPointLog.log2fpQ16]] (the no-transcendental
  * rule — a libm `ln` would break the oracle's exact compare), summed
  * per document as plain Longs; only the final displayed average does
  * one stated double division. The low-quality DECISION is a pure
  * integer compare (score_q16 < threshold_q16 · n_tokens).
  *
  * 100 TB: training is three grouped integer counts over one
  * (persisted) gram relation — mergeable partials, no row-scale
  * state; scoring is three LEFT equi-joins of the token stream
  * against count tables keyed by gram (broadcast when small, shuffle
  * joins that scale out when not) plus one per-document aggregate.
  * The per-document window (two lags) partitions by document, so no
  * skew concentrates.
  */
object LanguageModel {

  /** Per-word log₂-score tables + the 1-row meta frame. The `lq*`
    * columns are PRE-folded deltas (numerator lg − denominator lg
    * [+ discount]), so scoring coalesces one Long per token. */
  final case class StupidBackoffModel(
      tri: DataFrame, bi: DataFrame, uni: DataFrame, meta: DataFrame,
      caches: Seq[DataFrame])

  /** log2(0.4)·2¹⁶ by the shared 16-step dag ([[FixedPointLog]]). */
  val DiscountQ16: Long = FixedPointLog.Log2Of04Q16

  private def toks(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpeVocab.PretokenRegex), lit(0))

  /** (doc, pos, w, w1, w2): each scored position with its two-word
    * context, ⟨s⟩-padded at document start. */
  private def grams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    df.select(col(idCol), posexplode(toks(col(textCol))))
      .withColumnRenamed("pos", "_pos").withColumnRenamed("col", "_w")
      .withColumn("_w1", lag(col("_w"), 1, "<s>").over(w))
      .withColumn("_w2", lag(col("_w"), 2, "<s>").over(w))
  }

  /** One-census training pass over the clean slice. */
  def trainStupidBackoff(
      clean: DataFrame, idCol: String, textCol: String): StupidBackoffModel = {
    // the gram relation feeds SIX aggregates — persist it or the
    // explode+window pipeline re-runs per count table
    val g = grams(clean, idCol, textCol)
      .select(col("_w2"), col("_w1"), col("_w")).persistCensus()
    val lg = (c: Column) => Log2FpQ16(c)

    val c3 = g.groupBy("_w2", "_w1", "_w").agg(count(lit(1)).as("_n3"))
    val cx3 = g.groupBy("_w2", "_w1").agg(count(lit(1)).as("_nc3"))
    val tri = c3.join(cx3, Seq("_w2", "_w1"))
      .select(col("_w2"), col("_w1"), col("_w"),
        (lg(col("_n3")) - lg(col("_nc3"))).as("_lq3"))

    val cb = g.groupBy("_w1", "_w").agg(count(lit(1)).as("_nb"))
    val cx1 = g.groupBy("_w1").agg(count(lit(1)).as("_nc1"))
    val bi = cb.join(cx1, Seq("_w1"))
      .select(col("_w1"), col("_w"),
        (lit(DiscountQ16) + lg(col("_nb")) - lg(col("_nc1"))).as("_lqb"))

    val tot = g.agg(count(lit(1)).as("_nn"))
    val uni = g.groupBy("_w").agg(count(lit(1)).as("_n1"))
      .crossJoin(broadcast(tot))
      .select(col("_w"),
        (lit(2L * DiscountQ16) + lg(col("_n1")) - lg(col("_nn"))).as("_lqu"))

    // unknown-word score: 0.4² · 1/N, i.e. 2·discount − lg(N)
    val meta = tot.select(col("_nn").as("train_tokens"),
      (lit(2L * DiscountQ16) - lg(col("_nn"))).as("_unk_q16"))

    StupidBackoffModel(tri, bi, uni, meta, Seq(g))
  }

  /** Per-document Stupid Backoff score over `docs`: n_tokens, exact
    * Q16 log₂-score sum, the displayed per-token average, and the
    * integer-exact low-quality flag. Documents with zero tokens are
    * not scorable and are excluded (stated).
    */
  def scoreStupidBackoff(
      model: StupidBackoffModel, docs: DataFrame, idCol: String,
      textCol: String, thresholdQ16PerToken: Long): DataFrame = {
    val sg = grams(docs, idCol, textCol)
    val scored = sg
      .join(model.tri, Seq("_w2", "_w1", "_w"), "left")
      .join(model.bi, Seq("_w1", "_w"), "left")
      .join(model.uni, Seq("_w"), "left")
      .crossJoin(broadcast(model.meta))
      .select(col(idCol),
        coalesce(col("_lq3"), col("_lqb"), col("_lqu"), col("_unk_q16"))
          .as("_q"))
    val out = scored.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("_q")).as("score_q16"))
      .select(col(idCol), col("n_tokens"), col("score_q16"),
        (col("score_q16").cast("double")
          / (lit(65536.0) * col("n_tokens").cast("double")))
          .as("avg_log2_prob"),
        (col("score_q16") < lit(thresholdQ16PerToken) * col("n_tokens"))
          .as("low_quality"))
    graft.CacheLifecycle.releaseWhenExecuted(out, model.caches)
    out
  }

  /** Train-on-clean-slice, score-the-rest composition (the query
    * surface): train split = `trainPred`, score split = its
    * complement. */
  def lmQualityGate(
      docs: DataFrame, idCol: String, textCol: String, trainPred: Column,
      thresholdQ16PerToken: Long): DataFrame = {
    val model = trainStupidBackoff(docs.filter(trainPred), idCol, textCol)
    scoreStupidBackoff(model, docs.filter(!trainPred), idCol, textCol,
      thresholdQ16PerToken)
  }

  /** The model as a serializable in-memory scorer for the STREAMING
    * screen ([[graft.streaming.StreamingCuration.lmScreen]]) — the
    * semanticScreen discipline: collected once under a LOUD size
    * guard (a standing monitor's reference model is config-sized by
    * construction; a corpus-scale model belongs on the batch path's
    * scalable joins, not in a plan reference). Lookup keys are the
    * space-joined grams (words never contain spaces). Scores are the
    * same pre-folded Q16 deltas, so stream == batch EXACTLY.
    */
  def collectModel(model: StupidBackoffModel,
      maxEntries: Int = 1 << 22): LmScorer = {
    def toMap(df: DataFrame, keyCols: Seq[String], valCol: String) = {
      // the size guard runs BEFORE full materialization: head(n+1)
      // ships at most maxEntries+1 rows to the driver, so an
      // over-budget model (trained on a corpus-scale slice by
      // mistake) fails the require without first OOMing the driver
      val rows = df.head(maxEntries + 1)
      require(rows.length <= maxEntries,
        s"LM table has > $maxEntries rows — a model that " +
          "size is not plan-shippable; score through the batch " +
          "scoreStupidBackoff joins instead")
      rows.map { r =>
        keyCols.map(r.getAs[String](_)).mkString(" ") -> r.getAs[Long](valCol)
      }.toMap
    }
    val scorer = new LmScorer(
      toMap(model.tri, Seq("_w2", "_w1", "_w"), "_lq3"),
      toMap(model.bi, Seq("_w1", "_w"), "_lqb"),
      toMap(model.uni, Seq("_w"), "_lqu"),
      model.meta.head().getAs[Long]("_unk_q16"))
    model.caches.foreach(_.unpersist())
    scorer
  }
}

/** In-memory Stupid Backoff scorer (collected model) — the engine of
  * the streaming LM screen. Pure function of the text; exact-Q16
  * identical to the batch join path by construction. */
final class LmScorer(
    val tri: Map[String, Long], val bi: Map[String, Long],
    val uni: Map[String, Long], val unkQ16: Long) extends Serializable {

  @transient private lazy val pretoken =
    java.util.regex.Pattern.compile(BpeVocab.PretokenRegex)

  /** [[score]] as a Catalyst row — the streaming screen's codegen
    * call. */
  def scoreRow(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val (n, s) = score(text.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, s))
  }

  /** (n_tokens, score_q16) of one document. */
  def score(text: String): (Int, Long) = {
    var w2 = "<s>"; var w1 = "<s>"
    var n = 0; var sum = 0L
    val m = pretoken.matcher(text.toLowerCase(java.util.Locale.ROOT))
    while (m.find()) {
      val w = m.group()
      val q = tri.getOrElse(w2 + " " + w1 + " " + w,
        bi.getOrElse(w1 + " " + w, uni.getOrElse(w, unkQ16)))
      sum += q; n += 1
      w2 = w1; w1 = w
    }
    (n, sum)
  }
}
