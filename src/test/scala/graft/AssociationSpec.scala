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
}
