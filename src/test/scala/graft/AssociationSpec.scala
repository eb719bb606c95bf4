package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Association

class AssociationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("co-occurrence pairs: distinct-per-group, unordered-once, support filter, null fence") {
    val df = Seq(
      (1, "a"), (1, "b"), (1, "b"),      // dup (1,b) counts once
      (2, "a"), (2, "b"), (2, "c"),
      (3, "a"), (3, "c"),
      (4, "a"), (4, null))               // null item excluded
      .toDF("g", "i")
    val all = Association.coOccurrencePairs(df, col("g"), col("i"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // (a,b) in groups 1,2; (a,c) in 2,3; (b,c) in 2 — each pair once, a<b order
    assert(all == Map(("a", "b") -> 2L, ("a", "c") -> 2L, ("b", "c") -> 1L))
    val supported = Association.coOccurrencePairs(df, col("g"), col("i"), minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(supported == Set(("a", "b"), ("a", "c")))
    // single-item groups produce no pairs; empty input empty output
    val solo = Seq((1, "a")).toDF("g", "i")
    assert(Association.coOccurrencePairs(solo, col("g"), col("i")).count() == 0)
  }

  test("pair lift: marginals count groups-with-item, scores are exact integer ratios") {
    val df = Seq(
      (1, "a"), (1, "b"),
      (2, "a"), (2, "b"), (2, "c"),
      (3, "a"), (3, "c"),
      (4, "a"), (4, null))               // null item still excluded; group 4 counts for a and the total
      .toDF("g", "i")
    val rows = Association.pairLift(df, col("g"), col("i"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->  // (item_a, item_b)
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8))).toMap
    // marginals: a in 4 groups, b in 2, c in 2; total groups = 4
    // (a,b): support 2, lift = 2*4/(4*2) = 1.0, conf a->b = 2/4, b->a = 2/2
    assert(rows(("a", "b")) == ((2L, 4L, 2L, 4L, 1.0, 0.5, 1.0)))
    // (a,c): support 2, lift = 2*4/(4*2) = 1.0
    assert(rows(("a", "c")) == ((2L, 4L, 2L, 4L, 1.0, 0.5, 1.0)))
    // (b,c): support 1, lift = 1*4/(2*2) = 1.0, confs 0.5/0.5
    assert(rows(("b", "c")) == ((1L, 2L, 2L, 4L, 1.0, 0.5, 0.5)))
    // support filter still applies
    assert(Association.pairLift(df, col("g"), col("i"), minSupport = 2).count() == 2)
  }
}
