package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FixedPointLog, Log2FpQ16}
import graft.operators.LanguageModel

/** Fixed-point log2 (the portable log surface) and the Stupid-Backoff
  * LM quality gate: exact branch arithmetic and the planted-gibberish
  * ranking the operator exists to produce.
  */
class LanguageModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------
  // log2fpQ16
  // ---------------------------------------------------------------

  test("log2fpQ16: exact pinned values and error bound") {
    // pinned against the DuckDB recursive-CTE replay (validated
    // in-session: identical for every probe value)
    val pinned = Map(1L -> 0L, 2L -> 65536L, 3L -> 103872L, 5L -> 152169L,
      10L -> 217705L, 1000L -> 653117L, 12345L -> 890741L,
      2147483648L -> 2031616L, 4611686018427387903L -> 4063231L)
    for ((n, lq) <- pinned)
      assert(FixedPointLog.log2fpQ16(n) == lq, s"n=$n")
    // truncation-only error: within 2 Q16 ulps of true log2
    for (n <- Seq(7L, 42L, 999983L, 123456789L, 1L << 40))
      assert(math.abs(FixedPointLog.log2fpQ16(n)
        - math.log(n.toDouble) / math.log(2.0) * 65536.0) <= 2.0, s"n=$n")
    assert(FixedPointLog.Log2Of04Q16 == -86634L)
    assertThrows[IllegalArgumentException](FixedPointLog.log2fpQ16(0L))
  }

  test("Log2FpQ16 column expression equals the static function") {
    val vals = Seq(1L, 2L, 6L, 100L, 999983L, 1L << 50)
    val got = vals.toDF("n").select(Log2FpQ16(col("n")).as("lq"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == vals.map(FixedPointLog.log2fpQ16))
    val n = Seq(Tuple1(null.asInstanceOf[java.lang.Long])).toDF("n")
      .select(Log2FpQ16(col("n").cast("long"))).head()
    assert(n.isNullAt(0))
  }

  // ---------------------------------------------------------------
  // Stupid Backoff gate
  // ---------------------------------------------------------------

  private val trainDocs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cat sat on the rug"),
    (2L, "the dog sat on the mat"),
    (3L, "a cat ran to the mat"),
    (4L, "the dog ran to the rug"),
    (5L, "a dog sat on a mat"),
    (6L, "the cat ran to a rug"),
    (7L, "a dog ran on the rug"))

  private def gate(score: Seq[(Long, String)], thresholdQ16: Long = -20L * 65536L) =
    LanguageModel.lmQualityGate(
      (trainDocs ++ score).toDF("doc_id", "text"), "doc_id", "text",
      trainPred = col("doc_id") < 8, thresholdQ16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap

  test("LM gate ranks fluent text above its own scrambled words") {
    val out = gate(Seq(
      (10L, "the cat sat on the mat"),   // fluent: trained word order
      (11L, "mat the on sat cat the"),   // same words, scrambled order
      (12L, "zq wv zq wv zq wv")))       // unknown words entirely
    val fluent = out(10L)._3
    val scrambled = out(11L)._3
    val unknown = out(12L)._3
    assert(fluent > scrambled,
      s"fluent $fluent must outscore scrambled $scrambled")
    assert(scrambled > unknown,
      s"known-word gibberish $scrambled must outscore unknown $unknown")
    // same token counts on 10/11: the ORDER alone moved the score
    assert(out(10L)._1 == 6L && out(11L)._1 == 6L)
  }

  test("LM gate vs linear gate: the disagreement census isolates scrambled word order") {
    // the q190 composition's semantics, pinned on a corpus built so
    // the two gates MUST disagree on exactly one set: scrambled twins
    // carry the identical linear features (permutation-invariant
    // ratios — scrambles chosen with no adjacent stopwords, so the
    // non-overlapping ' the '-count trick sees the same count) but
    // broken word ORDER, which only the LM sees
    import graft.operators.TextAnalysis
    val fluent = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "the dog ran to the rug"),
      (12L, "a cat sat on a rug"))
    val scrambled = Seq(
      (13L, "mat the on sat cat the"),
      (14L, "rug the to ran dog the"),
      (15L, "rug a on sat cat a"))
    val docs = (trainDocs ++ fluent ++ scrambled).toDF("doc_id", "text")
    val lin = TextAnalysis.linearQualityScore(docs, "doc_id", "text",
      bias = -2.0, wStopword = 8.0, wPunct = -4.0,
      wMeanWordLen = 0.25, wKChars = 0.5)
    val linMap = lin.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (((f, _), (s, _)) <- fluent.zip(scrambled))
      assert(linMap(f) == linMap(s),
        s"scrambling must not move the linear logit ($f vs $s)")
    // elect a separating LM threshold from a first scoring pass
    val first = gate(fluent ++ scrambled, thresholdQ16 = -(1L << 40))
    val fluentMin = fluent.map(x => first(x._1)._3).min
    val scrambledMax = scrambled.map(x => first(x._1)._3).max
    assert(fluentMin > scrambledMax,
      s"the LM must separate the groups ($fluentMin vs $scrambledMax)")
    val thrQ16 = math.round((fluentMin + scrambledMax) / 2.0 * 65536.0)
    val lm = LanguageModel.lmQualityGate(docs, "doc_id", "text",
      trainPred = col("doc_id") < 8, thrQ16)
    // the disagreement census proper: LM verdict x linear verdict
    val census = lm.select(col("doc_id"), col("low_quality"))
      .join(lin.select(col("doc_id"), col("keep")), "doc_id")
      .groupBy(col("low_quality"), col("keep"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    // every fluent/scrambled twin shares its `keep`; low_quality
    // splits them — so the scrambled docs are EXACTLY the rows where
    // the gates disagree (low_quality=true under an identical keep)
    val keepVal = lin.filter(col("doc_id") === 10L).head().getBoolean(2)
    assert(census((true, keepVal)) == 3L,
      "all three scrambled docs must land in the disagreement cell")
    assert(census((false, keepVal)) == 3L)
    assert(census.values.sum == 6L)
    // and the flagged set IS the scrambled set
    val flagged = lm.filter(col("low_quality")).collect()
      .map(_.getLong(0)).toSet
    assert(flagged == scrambled.map(_._1).toSet)
  }

  test("branch arithmetic is exact Q16: trigram, unknown, empty-doc") {
    val lg = FixedPointLog.log2fpQ16 _
    val D = FixedPointLog.Log2Of04Q16
    val out = gate(Seq(
      (10L, "the"),        // one token, <s> <s> context
      (12L, "zq zq"),      // two unknown tokens
      (13L, "")))          // zero tokens: not scorable, excluded
    // c3(<s>,<s>,the) = 5 train docs start with 'the'; c(<s>,<s>,·) = 8
    assert(out(10L)._2 == lg(5) - lg(8))
    // unknown: 2·discount − lg(N), N = 48 train tokens
    assert(out(12L)._2 == 2L * (2L * D - lg(48)))
    assert(!out.contains(13L))
    // displayed average is the stated single division of the exact sum
    assert(out(12L)._4 == (out(12L)._2 < -20L * 65536L * 2L))
  }

  test("streaming LM screen equals the batch scorer exactly (Q16)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val model = LanguageModel.trainStupidBackoff(
      trainDocs.toDF("doc_id", "text"), "doc_id", "text")
    val batch = LanguageModel.scoreStupidBackoff(model,
        Seq((10L, "the cat sat on a rug"), (11L, "rug rug zq the"))
          .toDF("doc_id", "text"),
        "doc_id", "text", thresholdQ16PerToken = -4L * 65536L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    // re-train for the collected scorer: scoreStupidBackoff released
    // the model's gram cache when the batch run executed
    val scorer = LanguageModel.collectModel(LanguageModel.trainStupidBackoff(
      trainDocs.toDF("doc_id", "text"), "doc_id", "text"))
    val stream = MemoryStream[(Long, String)]
    val screened = graft.streaming.StreamingCuration.lmScreen(
      stream.toDF().toDF("doc_id", "text"), scorer, "text",
      thresholdQ16PerToken = -4L * 65536L)
    val sink = screened.writeStream.format("memory").queryName("lm_screen")
      .outputMode("append").start()
    stream.addData(Seq((10L, "the cat sat on a rug"),
      (11L, "rug rug zq the"), (12L, "")))
    sink.processAllAvailable(); sink.stop()
    val out = spark.table("lm_screen").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- Seq(10L, 11L)) {
      assert(out(id).getAs[Long]("n_tokens") == batch(id)._1, s"id $id")
      assert(out(id).getAs[Long]("score_q16") == batch(id)._2, s"id $id")
      assert(out(id).getAs[Boolean]("low_quality") == batch(id)._3, s"id $id")
    }
    // zero-token doc passes through unflagged with NULL score
    assert(out(12L).getAs[Long]("n_tokens") == 0L)
    assert(out(12L).isNullAt(out(12L).fieldIndex("score_q16")))
    assert(!out(12L).getAs[Boolean]("low_quality"))
    // the collect guard trips loudly on an over-budget model
    val ex = intercept[IllegalArgumentException] {
      LanguageModel.collectModel(LanguageModel.trainStupidBackoff(
        trainDocs.toDF("doc_id", "text"), "doc_id", "text"), maxEntries = 3)
    }
    assert(ex.getMessage.contains("not plan-shippable"))
  }

  test("backoff chain: bigram and unigram branches score between") {
    val lg = FixedPointLog.log2fpQ16 _
    val D = FixedPointLog.Log2Of04Q16
    // doc "rug cat": trigram (<s>,<s>,rug) unseen; bigram (<s>,rug)
    // unseen; unigram 'rug' seen (4 times in 48). Then trigram
    // (<s>,rug,cat) unseen, bigram (rug,cat) unseen, 'cat' seen 4×.
    val out = gate(Seq((20L, "rug cat")))
    val expected = 2L * (2L * D + lg(4) - lg(48))
    assert(out(20L)._2 == expected)
  }
}
