package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class BenchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every declared fixture-backed query is a registered query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.fixtureBackedQueries.filterNot(qs.contains)
    assert(missing.isEmpty,
      s"fixtureBacked names not in the query registry: $missing")
    // and every query has either an oracle or is a stated rows-only op
    val orphanOracles = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphanOracles.isEmpty,
      s"oracleSql entries without a query: $orphanOracles")
  }

  test("fixture coverage loop: declared queries record themselves; undeclared owners are refused") {
    import graft.queries.QueryFixtures
    // forward direction: running every DECLARED fixture-backed query
    // makes it register its ownership (ensure runs at plan-build time)
    for (q <- SparkEntry.fixtureBackedQueries)
      SparkEntry.queries(q)(spark, TestSpark.sf)
    assert(QueryFixtures.recordedOwners == SparkEntry.fixtureBackedQueries.toSet,
      "every declared fixture-backed query must call ensure under its own name")
    // reverse direction is structural: an UNDECLARED owner cannot call
    // ensure at all — the forgotten-declaration failure mode (r12
    // verdict item 2) now fails the suite, not the bench
    val e = intercept[IllegalArgumentException] {
      QueryFixtures.ensure(spark, TestSpark.sf, "bogus_fixture",
        "q999_not_declared")(spark.range(1).toDF("id"))
    }
    assert(e.getMessage.contains("undeclared owner"))
  }

  test("evalAll completes over uniform 64-bit hashes (no ANSI overflow)") {
    // Summing uniform 64-bit hashes overflows Long within a handful of
    // rows under ANSI mode (each addition overflows w.p. ~1/2) — the
    // r2 harness defect. The XOR fold must evaluate every row of every
    // column without arithmetic.
    val wide = spark.range(100000).selectExpr(
      "xxhash64(id) AS a", "xxhash64(id + 1) AS b", "CAST(id AS STRING) AS c")
    Bench.evalAll(wide) // must not throw
  }

  test("run surfaces per-query errors instead of swallowing them") {
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(10).selectExpr("id", "id * 2 AS d")
    // ANSI integral division by zero at id=5: a genuine runtime abort
    val broken: (SparkSession, String) => DataFrame =
      (s, _) => s.range(10).selectExpr("id div (id - 5) AS x")
    val results = Bench.run(Seq("ok" -> ok, "broken" -> broken), spark, TestSpark.sf)
    assert(results.map(_.name) == Seq("ok", "broken"))
    val byName = results.map(r => r.name -> r).toMap
    assert(byName("ok").err.isEmpty)
    assert(byName("broken").err.isDefined,
      "a failing query must carry an err field, not report success")
    assert(results.forall(r => r.sec >= 0.0 && r.coldSec >= 0.0))
    // a failed query is not re-run: its warm timing IS its cold timing
    assert(byName("broken").sec == byName("broken").coldSec)
    assert(byName("broken").warmSecs.isEmpty)
  }

  test("sec is the minimum over the requested warm passes") {
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(10).selectExpr("id")
    val results = Bench.run(Seq("ok" -> ok), spark, TestSpark.sf, warmPasses = 3)
    val r = results.head
    assert(r.warmSecs.size == 3)
    assert(r.sec == r.warmSecs.min,
      "canonical sec must be the noise-robust min over warm passes")
  }
}
