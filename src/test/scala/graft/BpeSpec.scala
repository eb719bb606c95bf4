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
    // digits pretokenize as one run but never merge (no digit merges)
    assert(enc.encode("12345").toSeq == Seq("1", "2", "3", "4", "5"))
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
}
