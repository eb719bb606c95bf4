package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NormalizeExpression.normalizeText
import graft.functions.NormalizeText
import graft.operators.Dedup

/** normalize_text (NFC → ROOT lowercase → ASCII-whitespace collapse →
  * trim) — pins interpreted eval vs codegen, the documented semantics
  * including the DuckDB-replayable whitespace class, and its call
  * path as the key expression of exact dedup.
  */
class NormalizeExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixtures = Seq(
    "Hello  World",
    "  leading and trailing\t ",
    "tab\tnewline\nvtff\fcr\rend",
    "UPPER lower MiXeD",
    "café",               // é precomposed (NFC)
    "café",              // e + combining acute (NFD) → must NFC to é
    "Å ANGSTROM SIGN",    // NFC-composes to Å (U+00C5)
    "", " ", "\t\n", "héllo wörld",
    "a" * 100 + "\n\n" + "b" * 100)

  test("interpreted eval equals codegen output on every fixture") {
    val df = fixtures.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    // the projection runs through whole-stage codegen (doGenCode)
    val viaCodegen = df.select($"id", normalizeText($"s").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // direct interpreted path: the same compute() nullSafeEval calls
    fixtures.zipWithIndex.foreach { case (s, i) =>
      val interp = NormalizeText.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
      assert(viaCodegen(i.toLong) == interp, s"codegen != eval for <$s>")
    }
  }

  test("semantics: NFC, ROOT lowercase, ASCII ws collapse, trim, null propagation") {
    def n(s: String): String =
      Seq(Tuple1(s)).toDF("s").select(normalizeText($"s")).head().getString(0)
    assert(n("Hello  World") == "hello world")
    assert(n("  pad \t me  ") == "pad me")
    assert(n("café") == "café", "NFD input must compose to NFC")
    assert(n("cafÉ") == "café")
    assert(n("\t\n ") == "")
    assert(n("ab\fc\rd") == "a b c d", "VT/FF/CR are in the collapse class")
    val row = Seq(Tuple1(Option.empty[String])).toDF("s")
      .select(normalizeText($"s")).head()
    assert(row.isNullAt(0), "null in, null out")
  }

  test("equals the composed lower+regexp plan on already-NFC input (the oracle form)") {
    // on NFC text the expression is exactly the documented DuckDB
    // replay: lower → collapse [ \t\n\x0B\f\r]+ → trim. (Off-NFC
    // input is where the native expression is strictly better.)
    val nfc = fixtures.filter(s =>
      java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
    val df = nfc.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val composed = trim(regexp_replace(lower($"s"), "[ \\t\\n\\x0B\\f\\r]+", " "))
    val mismatches = df
      .select(normalizeText($"s").as("a"), composed.as("b"))
      .filter($"a" =!= $"b")
      .collect()
    assert(mismatches.isEmpty, mismatches.mkString("; "))
  }

  test("as the exact-dedup key: encoding and spacing variants collapse to one doc") {
    val docs = Seq(
      (1L, "Café  du   Monde"),     // NFC, extra spaces
      (2L, "café du\tmonde"),      // NFD, tab
      (3L, "CAFE DU MONDE"),             // same letters, no accent → distinct
      (4L, "unrelated text")
    ).toDF("doc_id", "text")
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", normalizeText($"text"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L),
      s"1 and 2 are the same doc after normalization; min id 1 survives: $kept")
  }
}
