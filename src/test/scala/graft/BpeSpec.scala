package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bpe, BpeEncoder, BpeVocab}

/** Real BPE tokenization: hand-tokenized fixtures against a tiny
  * explicit merge table, default-vocab invariants, and expression/
  * core parity (interpreted and codegen paths share one encoder).
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------
  // Hand-tokenized fixture: a 4-merge vocabulary applied by hand.
  // ---------------------------------------------------------------
  private val tiny = Seq(("a", "b"), ("ab", "c"), ("a", "a"), ("d", "e"))

  test("merge loop matches the hand-applied BPE on a tiny vocab") {
    val enc = new BpeEncoder(tiny)
    // 'abc': a+b (rank 0) -> [ab, c]; ab+c (rank 1) -> [abc]
    assert(enc.encodeWord("abc").toSeq == Seq("abc"))
    // 'aaa': a+a merges left-to-right non-overlapping -> [aa, a]
    // (no aa+a merge listed, so it stops there)
    assert(enc.encodeWord("aaa").toSeq == Seq("aa", "a"))
    // 'abab': rank-0 pair merges ALL occurrences in one round
    assert(enc.encodeWord("abab").toSeq == Seq("ab", "ab"))
    // rank order decides: in 'aab', a+b (rank 0) wins over a+a
    // (rank 2): [a, ab], and nothing else applies
    assert(enc.encodeWord("aab").toSeq == Seq("a", "ab"))
    // unseen symbols pass through untouched
    assert(enc.encodeWord("xyz").toSeq == Seq("x", "y", "z"))
    // full-text path: lowercase + pretokenize, punctuation isolated
    assert(enc.encode("ABC de, xab!").toSeq ==
      Seq("abc", "de", ",", "x", "ab", "!"))
    assert(enc.tokenCount(
      org.apache.spark.unsafe.types.UTF8String.fromString("ABC de, xab!")) == 6)
  }

  test("default vocab: tokens concatenate back to the word; counts consistent") {
    val enc = new BpeEncoder(BpeVocab.default)
    for (w <- Seq("stream", "filter", "window", "spark", "batch", "the",
        "customer", "quantile", "zzz", "a", "7", "42")) {
      val toks = enc.encodeWord(w)
      assert(toks.mkString == w, s"tokens of '$w' must concatenate to it")
      assert(toks.nonEmpty && toks.forall(_.nonEmpty))
    }
    // trained-on-corpus sanity: frequent corpus words fully merge
    assert(enc.encodeWord("scan").length == 1)
    assert(enc.encodeWord("window").length == 1)
    // out-of-vocabulary words decompose into LEARNED subwords, not
    // characters — the production-shaped profile of the 306-merge
    // exhaustion vocabulary
    assert(enc.encodeWord("windows").toSeq == Seq("window", "s"))
    assert(enc.encodeWord("quantile").toSeq == Seq("qu", "an", "t", "i", "le"))
  }

  test("default vocab: multi-step rank chains >=3 deep") {
    val enc = new BpeEncoder(BpeVocab.default)
    // digit runs merge pairwise through deep chains: 0+0 -> 00,
    // 00+00 -> 0000, 0000+00 -> 000000, 000000+0 -> 0000000, ... —
    // the customer-name surface ('customer#000000001')
    assert(enc.encodeWord("000000001").toSeq == Seq("000000001"))
    assert(enc.encode("12345").toSeq == Seq("12", "34", "5"))
    // 'furniture' sits at the deepest chain (7 merges stacked); its
    // single terminal token proves the loop follows chains, not just
    // first-order pairs
    assert(enc.encodeWord("furniture").toSeq == Seq("furniture"))
    assert(enc.encodeWord("automobile").toSeq == Seq("automobile"))
    // chain-depth witness on an explicit table: abcd needs the
    // 3-deep chain ab -> abc -> abcd applied in rank order
    val chain = new BpeEncoder(Seq(("a", "b"), ("ab", "c"), ("abc", "d")))
    assert(chain.encodeWord("abcd").toSeq == Seq("abcd"))
    assert(chain.encodeWord("abcx").toSeq == Seq("abc", "x"))
  }

  test("merges.txt loader parses the interchange format; validation rejects ill-formed tables") {
    val txt = "#version: 0.2\na b\nab c\n\nx y\n"
    assert(BpeVocab.fromMergesText(txt) == Seq(("a", "b"), ("ab", "c"), ("x", "y")))
    // a component that is neither a single code point nor an earlier
    // merge product — the divergence case the ADVICE documented:
    // [(ab,a),(a,b)] on 'abab' would tokenize differently in the
    // engine (all-occurrence passes) and the oracle (single replace)
    val ill = intercept[IllegalArgumentException] {
      new BpeEncoder(Seq(("ab", "a"), ("a", "b")))
    }
    assert(ill.getMessage.contains("rank-well-formed"))
    // duplicate pairs make ranks ambiguous
    val dup = intercept[IllegalArgumentException] {
      BpeVocab.validateMerges(Seq(("a", "b"), ("a", "b")))
    }
    assert(dup.getMessage.contains("duplicates"))
    // spaces can never appear in symbols (pair-key delimiter)
    val sp = intercept[IllegalArgumentException] {
      BpeVocab.validateMerges(Seq(("a ", "b")))
    }
    assert(sp.getMessage.contains("space"))
    // malformed merges.txt line
    val bad = intercept[IllegalArgumentException] {
      BpeVocab.fromMergesText("a b c\n")
    }
    assert(bad.getMessage.contains("expected 'left right'"))
  }

  test("column expressions equal the core encoder (codegen path)") {
    val df = Seq(
      (1L, "the fast table scan"),
      (2L, "Stream FILTER window!"),
      (3L, ""),
      (4L, "spark query vector")).toDF("id", "text")
    val got = df.select($"id", Bpe.bpeTokenCount($"text").as("n"),
        Bpe.bpeTokens($"text").as("toks"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[String](2).toSeq)).toMap
    val enc = new BpeEncoder(BpeVocab.default)
    for ((id, text) <- Seq((1L, "the fast table scan"),
        (2L, "Stream FILTER window!"), (3L, ""), (4L, "spark query vector"))) {
      val toks = enc.encode(text).toSeq
      assert(got(id) == ((toks.length, toks)), s"id $id")
    }
    // null text -> null outputs (UnaryExpression null propagation)
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(Bpe.bpeTokenCount($"text"), Bpe.bpeTokens($"text")).head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("custom merge table flows through the column API") {
    val df = Seq((1L, "abc aaa")).toDF("id", "text")
    val r = df.select(Bpe.bpeTokens($"text", tiny).as("t"),
      Bpe.bpeTokenCount($"text", tiny).as("n")).head()
    assert(r.getSeq[String](0).toSeq == Seq("abc", "aa", "a"))
    assert(r.getInt(1) == 3)
  }

  test("production vocab: loads through fromMergesText, >=1k merges, well-formed, non-degenerate OOD") {
    val prod = BpeVocab.production
    // the production bar: at least 1k merges, rank-well-formed (the
    // lazy val would have thrown otherwise), loaded off the classpath
    // through the interchange parser
    assert(prod.size >= 1000, s"production table has ${prod.size} merges")
    BpeVocab.validateMerges(prod) // idempotent re-check
    val enc = new BpeEncoder(prod)
    // in-distribution: the documents vocabulary fully merges
    assert(enc.encode("customer window stream").toSeq
      == Seq("customer", "window", "stream"))
    // out-of-distribution digit runs tokenize PARTIALLY (1 < fertility
    // < char count): the surface q198 pins against the oracle
    val toks = enc.encode("987654321")
    assert(toks.length > 1 && toks.length < 9,
      s"expected partial merge of an unseen digit run, got ${toks.toSeq}")
    assert(toks.mkString == "987654321")
    // the column API and the core encoder agree at this size too
    val viaCol = Seq((1L, "customer#987654321 building"))
      .toDF("id", "text")
      .select(Bpe.bpeTokens($"text", prod)).head().getSeq[String](0).toSeq
    assert(viaCol == enc.encode("customer#987654321 building").toSeq)
  }

  test("large vocab: 15,971 merges through fromMergesText; production is its exact prefix") {
    val large = BpeVocab.large
    assert(large.size == 15971, s"large table has ${large.size} merges")
    BpeVocab.validateMerges(large) // idempotent re-check
    // the two tables are the SAME training run up to the min-count
    // stop: production (min pair count 2) is the exact prefix of
    // large (min count 1) — any divergence means the trainers or the
    // shipped files drifted
    val prod = BpeVocab.production
    assert(large.take(prod.size) == prod,
      "production must be the exact rank prefix of the large table")
    // every corpus word fully merges under the large table
    // (full-vocabulary exhaustion), including the single-occurrence
    // entity names that stay multi-token under production
    val enc = new BpeEncoder(large)
    assert(enc.encode("customer window stream").toSeq
      == Seq("customer", "window", "stream"))
    // an out-of-vocabulary digit run still tokenizes PARTIALLY —
    // the q205 surface
    val toks = enc.encode("987654321987")
    assert(toks.length > 1 && toks.mkString == "987654321987",
      s"expected partial merge of an unseen digit run, got ${toks.toSeq}")
  }
}
