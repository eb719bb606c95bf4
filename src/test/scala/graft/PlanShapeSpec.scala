package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{AnalyticsQueries, ExtensionQueries, ParityQueries}

/** Pins the SCALE.md plan invariants: filter pushdown, column
  * pruning, broadcast discipline, top-k shape. A regression that
  * silently drops one of these still passes value checks at test SF —
  * these specs are what catch it.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = TestSpark.sf

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q30: shipdate predicate pushed to parquet, schema pruned") {
    val p = plan(AnalyticsQueries.q30PricingSummary(spark, d))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"))
    assert(!p.contains("l_orderkey"), "pricing summary must not read join keys")
    assert(p.contains("partial_sum"), "map-side combine expected")
  }

  test("q31: nation dimension joins via broadcast") {
    val p = plan(AnalyticsQueries.q31RevenueByNation(spark, d))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate"))
  }

  test("q02 events branch: cutoff pushes down on the raw nanos column") {
    val p = plan(ParityQueries.q02FanoutCounts(spark, d))
    assert(p.contains("LessThan(ts,"),
      "raw-long ts predicate must reach the events scan (row-group pruning)")
  }

  test("q15: brute top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan(ExtensionQueries.q15KnnBrute(spark, d))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Sort "), "global sort would not scale")
  }

  test("q14: native vector dot product in the similarity join (codegen hot loop)") {
    val p = plan(ExtensionQueries.q14EmbeddingNearDup(spark, d))
    assert(p.contains("vectordotproduct") || p.contains("VectorDotProduct"))
  }

  test("no scala UDFs anywhere in the query surface") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val p = plan(fn(spark, d))
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"$name must stay UDF-free")
    }
  }
}
