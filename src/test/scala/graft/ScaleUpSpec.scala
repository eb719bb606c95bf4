package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the ScaleUp salting invariants the rehearsal's validity rests
  * on: deterministic, word-count-preserving text substitution that
  * breaks cross-copy near-dupness while keeping within-copy duplicate
  * structure exact, and a bounded embedding jitter.
  */
class ScaleUpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val text =
    "the quick brown fox jumps over the lazy dog and then the fox " +
      "rests under the old oak tree while the dog watches the road"

  test("saltWords: copy 0 is identity; copies are deterministic, word-count-preserving, distinct") {
    val df = Seq(text).toDF("text")
    val out = df.select(
      ScaleUp.saltWords($"text", 0).as("c0"),
      ScaleUp.saltWords($"text", 1).as("c1a"),
      ScaleUp.saltWords($"text", 1).as("c1b"),
      ScaleUp.saltWords($"text", 2).as("c2")).head()
    assert(out.getString(0) == text, "copy 0 must be the identity")
    assert(out.getString(1) == out.getString(2), "same copy -> same output")
    assert(out.getString(1) != text && out.getString(3) != text)
    assert(out.getString(1) != out.getString(3), "different copies differ")
    assert(out.getString(1).split(" ").length == text.split(" ").length,
      "word count preserved")
  }

  test("saltWords: cross-copy 5-shingle Jaccard falls below near-dup thresholds") {
    val df = Seq(text).toDF("text")
    val Seq(a, b) = df.select(
      ScaleUp.saltWords($"text", 1), ScaleUp.saltWords($"text", 2))
      .head().toSeq.map(_.asInstanceOf[String])
    def shingles(s: String) =
      s.split(" ").sliding(5).map(_.toSeq).toSet
    val (sa, sb) = (shingles(a), shingles(b))
    val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
    assert(j < 0.3, s"cross-copy Jaccard must be far below 0.8, got $j")
    // within-copy duplicate structure is EXACT: identical inputs map
    // to identical outputs under the same copy salt
    val dup = Seq(text, text).toDF("text")
      .select(ScaleUp.saltWords($"text", 3)).collect().map(_.getString(0))
    assert(dup(0) == dup(1))
  }

  test("jitterVec: copy 0 identity; bounded, deterministic, id-dependent jitter") {
    val v = Array.tabulate(8)(i => (0.1f * (i + 1)))
    val df = Seq((1L, v), (2L, v)).toDF("id", "vec")
    val rows = df.select($"id",
      ScaleUp.jitterVec($"vec", $"id", 0).as("j0"),
      ScaleUp.jitterVec($"vec", $"id", 1).as("j1a"),
      ScaleUp.jitterVec($"vec", $"id", 1).as("j1b"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1),
        r.getSeq[Float](2), r.getSeq[Float](3))).sortBy(_._1)
    rows.foreach { case (_, j0, j1a, j1b) =>
      assert(j0 == v.toSeq, "copy 0 must be the identity")
      assert(j1a == j1b, "same (id, copy) -> same jitter")
      assert(j1a.size == v.length)
      j1a.zip(v).foreach { case (x, orig) =>
        assert(math.abs(x - orig) <= 0.0051f, s"jitter bounded: $x vs $orig")
      }
    }
    assert(rows(0)._3 != rows(1)._3,
      "different ids get different jitter (copies must not be parallel shifts)")
  }
}
