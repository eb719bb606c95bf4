package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** The native one-pass repetition_signals must be value-equal to the
  * composed pipeline (split + regex + array_distinct + the top-word
  * explode-agg join) it replaces — exact doubles, same edge handling.
  */
class RepetitionExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assertEqual(df: org.apache.spark.sql.DataFrame): Unit = {
    val native = TextAnalysis.repetitionSignals(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val composed = TextAnalysis.repetitionSignalsComposed(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(native.length == composed.length)
    native.zip(composed).foreach { case (n, c) =>
      assert(n == c, s"native $n != composed $c")
    }
  }

  test("value-equal to the composed plan on the corpus") {
    assertEqual(Tables.documents(spark, TestSpark.sf))
  }

  test("edge cases: empties, whitespace runs, trailing newlines, repeats") {
    val docs = Seq(
      (0L, ""),                                   // no tokens, one empty line
      (1L, "a"),                                  // single token, no bigram
      (2L, "a a a a"),                            // total repetition
      (3L, "x\n\nx\ny\n"),                        // blank + duplicate + trailing \n
      (4L, "  tab\tandvertical\ffeed\r x"), // every \s class
      (5L, "one two one two one"),                // repeated bigrams
      (6L, "line\nline\nline"),
      (7L, "\n\n\n"),                             // only empty lines
      (8L, "héllo wörld héllo wörld")             // multi-byte UTF-8 tokens
    ).toDF("doc_id", "text")
    assertEqual(docs)
  }

  test("hand-checked values") {
    val one = Seq((0L, "a b a\na b a")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(one, "doc_id", "text").collect()(0)
    assert(r.getLong(1) == 2)                    // two lines
    assert(r.getDouble(2) == 0.5)                // identical lines
    assert(r.getDouble(3) == 4.0 / 6.0)          // 'a' appears 4 of 6 tokens
    assert(r.getDouble(4) == 1.0 - 3.0 / 5.0)    // bigrams: ab,ba,aa,ab,ba
  }
}
