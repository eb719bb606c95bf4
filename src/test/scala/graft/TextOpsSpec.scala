package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Round-5 text operators: TF-IDF keyword extraction and overlapping
  * token-window chunking.
  */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------
  // TF-IDF keywords
  // ---------------------------------------------------------------

  test("tfidfKeywords ranks rare distinctive terms above ubiquitous ones") {
    // "common" appears in every doc (idf = 1); "zebra" only in doc 1
    val docs = Seq(
      (1L, "common zebra common zebra zebra"),
      (2L, "common words common filler text"),
      (3L, "common text filler words here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(4)) -> r.getString(1)).toMap
    // doc 1: zebra tf=3, df=1 → 3·3/1 = 9; common tf=2, df=3 → 2
    assert(out((1L, 1L)) === "zebra")
    assert(out((1L, 2L)) === "common")
  }

  test("tfidfKeywords is deterministic on score ties via term order and caps at k") {
    // two terms with identical tf and df in one doc → tie broken by term asc
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "gamma delta")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 5)
      .filter(col("doc_id") === 1L).orderBy("kw_rank").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("alpha", "beta"))
    assert(rows.map(_.getLong(4)).toSeq === Seq(1L, 2L))
  }

  test("tfidfKeywords lowercases and strips punctuation from terms") {
    val docs = Seq((1L, "Hello, HELLO! hello?")).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 1).collect()
    assert(rows.length === 1)
    assert(rows.head.getString(1) === "hello")
    assert(rows.head.getLong(2) === 3L) // tf counts all three casings as one term
  }

  // ---------------------------------------------------------------
  // Token chunking
  // ---------------------------------------------------------------

  private def tokensOf(text: String): Seq[String] =
    "\\S+".r.findAllIn(text).toSeq

  test("chunkByTokens covers every token, chunks match slices, no redundant tail") {
    val texts = Seq(
      3, 8, 9, 10, 16, 17, 24, 25, 100 // below/at/above chunk & stride edges
    ).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
    val docs = texts.toDF("doc_id", "text")
    val chunkTokens = 8
    val stride = 6
    val out = TextAnalysis.chunkByTokens(docs, "doc_id", "text", chunkTokens, stride)
      .collect().groupBy(_.getLong(0))
    texts.foreach { case (id, text) =>
      val tk = tokensOf(text)
      val chunks = out(id).sortBy(_.getLong(1))
      // chunk_idx is the dense 0..m grid positions that survived
      val starts = chunks.map(r => r.getLong(1).toInt * stride + 1)
      // every chunk is the exact slice of the original token stream
      chunks.zip(starts).foreach { case (r, s) =>
        val expected = tk.slice(s - 1, s - 1 + chunkTokens)
        assert(r.getString(2) === expected.mkString(" "), s"doc $id start $s")
        assert(r.getLong(3) === expected.length.toLong)
      }
      // total coverage: last chunk reaches the end
      assert(starts.max + chunkTokens - 1 >= tk.length, s"doc $id tail uncovered")
      // no redundant tail: each chunk past the first extends past the
      // previous chunk's (length-clamped) end, i.e. adds new tokens
      starts.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          val endA = math.min(a + chunkTokens - 1, tk.length)
          val endB = math.min(b + chunkTokens - 1, tk.length)
          assert(endB > endA, s"doc $id chunk at $b adds nothing beyond $endA")
        case _ => ()
      }
    }
  }

  test("chunkByTokens drops zero-token documents and validates parameters") {
    val docs = Seq((1L, "   "), (2L, "one two")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(docs, "doc_id", "text", 4, 4).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
    assert(out.head.getString(2) === "one two")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkByTokens(docs, "doc_id", "text", 4, 5)
    }
  }

  test("chunkByTokens back-to-back stride (= chunkTokens) partitions exactly") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val rows = TextAnalysis.chunkByTokens(docs, "doc_id", "text", 4, 4)
      .orderBy("chunk_idx").collect()
    assert(rows.map(_.getString(2)).toSeq ===
      Seq("w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10"))
    assert(rows.map(_.getLong(3)).toSeq === Seq(4L, 4L, 2L))
  }

  test("linearQualityScore: hand-checked logit; weights separate prose from junk") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "the cat is in the hat and the dog is of note"), // stopword-rich prose
      (2L, "!!! ??? ;;; ... ,,, :::")                       // punctuation soup
    ).toDF("doc_id", "text")
    val scored = TextAnalysis.linearQualityScore(
        docs, "doc_id", "text",
        bias = -2.0, wStopword = 8.0, wPunct = -4.0,
        wMeanWordLen = 0.25, wKChars = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    // the logit must be exactly the weighted fold of the q18 features
    val feats = TextAnalysis.qualityFeatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    docs.collect().map(_.getLong(0)).foreach { id =>
      val f = feats(id)
      val expected = -2.0 + 8.0 * f.getDouble(6) + -4.0 * f.getDouble(5) +
        0.25 * f.getDouble(7) + 0.5 * (f.getLong(1).toDouble / 1024.0)
      assert(scored(id).getDouble(1) == expected, s"logit mismatch for doc $id")
    }
    assert(scored(1L).getBoolean(2), "stopword-rich prose must pass")
    assert(!scored(2L).getBoolean(2), "punctuation soup must not pass the gate")
  }

  test("tokenEntropyBy: exact Q16 entropy — uniform 2 bits, constant 0, skew between, exclusions") {
    import graft.functions.FixedPointLog
    val rows: Seq[(String, String)] = Seq(
      ("uniform", "a b c d"),      // 4 singleton tokens: H = 2 exactly
      ("constant", "a a a"),       // one token x3: H = 0, normalized NULL
      ("skew", "a a a b"),         // c = (3,1): H = 2 - 3·lg3/(4·2^16)
      (null, "ignored"),
      ("nulltext", null))
    val out = TextAnalysis.tokenEntropyBy(
        rows.toDF("src", "text"), col("src"), col("text"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("uniform", "constant", "skew"))
    val u = out("uniform")
    assert(u.getAs[Long]("n_tokens") == 4L && u.getAs[Long]("distinct_tokens") == 4L)
    assert(u.getAs[Double]("type_token_ratio") == 1.0)
    assert(u.getAs[Double]("entropy_bits") == 2.0)   // lg(4) exact, Σc·lg(1) = 0
    assert(u.getAs[Double]("normalized_entropy") == 1.0)
    val c0 = out("constant")
    // H = lg3 − 3·lg3/3: the engine's stated dag, zero only up to the
    // two divisions — state it identically
    val lq3 = FixedPointLog.log2fpQ16(3L)
    assert(c0.getAs[Double]("entropy_bits") ==
      lq3.toDouble / 65536.0 - (3L * lq3).toDouble / (65536.0 * 3.0))
    assert(c0.isNullAt(c0.fieldIndex("normalized_entropy")),
      "a single-token distribution has no normalization scale")
    val s = out("skew")
    val lq4 = FixedPointLog.log2fpQ16(4L)
    val expected = lq4.toDouble / 65536.0 -
      (3L * lq3 + 1L * 0L).toDouble / (65536.0 * 4.0)
    assert(s.getAs[Double]("entropy_bits") == expected)
    assert(s.getAs[Double]("entropy_bits") < 2.0 &&
      s.getAs[Double]("entropy_bits") > 0.0,
      "skew must land strictly between constant and uniform")
  }

  test("zipfSlopeBy: hand-derived Q16 pairwise slopes, flat distribution reads 0, head cap bounds pairs") {
    import graft.functions.FixedPointLog
    val lq = FixedPointLog.log2fpQ16 _
    val rows = Seq(
      // counts 4/2/1 -> ranks 1/2/3: three pairwise slopes, odd count
      // so the median is an exact element, no interpolation
      ("zipfish", "a a a a b b c"),
      // flat counts: every pairwise slope is exactly 0
      ("flat", "x x y y"))
    val out = TextAnalysis.zipfSlopeBy(
        rows.toDF("src", "text"), col("src"), col("text"))
      .collect().map(r => r.getString(0) -> r).toMap
    val z = out("zipfish")
    assert(z.getAs[Long]("n_distinct_tokens") == 3L)
    assert(z.getAs[Long]("n_head") == 3L && z.getAs[Long]("n_pairs") == 3L)
    // slopes: (r1,r2): (lg2-lg4)/(lg2-lg1) = -1 exactly;
    // (r1,r3): (lg1-lg4)/(lg3-lg1); (r2,r3): (lg1-lg2)/(lg3-lg2) —
    // the same integer-delta/double-division dag the engine states
    val s12 = (lq(2) - lq(4)).toDouble / (lq(2) - lq(1)).toDouble
    val s13 = (lq(1) - lq(4)).toDouble / (lq(3) - lq(1)).toDouble
    val s23 = (lq(1) - lq(2)).toDouble / (lq(3) - lq(2)).toDouble
    assert(s12 == -1.0)
    val median = Seq(s12, s13, s23).sorted.apply(1)
    assert(z.getAs[Double]("zipf_slope") == median)
    assert(z.getAs[Double]("slope_min") == Seq(s12, s13, s23).min)
    assert(z.getAs[Double]("slope_max") == Seq(s12, s13, s23).max)
    val f = out("flat")
    assert(f.getAs[Double]("zipf_slope") == 0.0)
    // head cap: k = 2 keeps ranks 1..2 -> one pair
    val capped = TextAnalysis.zipfSlopeBy(
        rows.toDF("src", "text"), col("src"), col("text"), k = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(capped("zipfish").getAs[Long]("n_head") == 2L)
    assert(capped("zipfish").getAs[Long]("n_pairs") == 1L)
    assert(capped("zipfish").getAs[Double]("zipf_slope") == s12)
    assert(capped("zipfish").getAs[Long]("n_distinct_tokens") == 3L,
      "the vocabulary size reports the FULL census, not the head")
  }
}
