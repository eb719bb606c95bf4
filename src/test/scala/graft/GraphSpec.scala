package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("integer pagerank: hand-computed rounds on a symmetrized path a-b-c") {
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("a", "b")) // duplicate edge collapses
      .toDF("s", "t")
    // deg: a=1 b=2 c=1; unit 1_000_000, damping 850‰, base 150_000
    // round 1: s(a)=500000 s(b)=2000000 s(c)=500000
    //   -> a=c=150000+425000=575000, b=150000+1700000=1850000
    val r1 = ranks(Graph.pageRankInt(edges, col("s"), col("t"), iterations = 1))
    assert(r1 == Map("a" -> 575000L, "b" -> 1850000L, "c" -> 575000L))
    // round 2: s(a)=s(c)=1850000 div 2=925000, s(b)=575000+575000=1150000
    //   -> a=c=150000+786250=936250, b=150000+977500=1127500
    val r2 = ranks(Graph.pageRankInt(edges, col("s"), col("t"), iterations = 2))
    assert(r2 == Map("a" -> 936250L, "b" -> 1127500L, "c" -> 936250L))
    // total mass only ever shrinks (division truncation + no dangling
    // here): stays within a few micro-units of the start
    assert(r2.values.sum <= 3000000L && r2.values.sum >= 2999990L)
  }

  test("dangling nodes send nothing; their damped mass leaves the system") {
    val edges = Seq(("a", "b")).toDF("s", "t") // b has no out-edges
    val r = ranks(Graph.pageRankInt(edges, col("s"), col("t"), iterations = 1))
    assert(r == Map("a" -> 150000L, "b" -> 1000000L))
    // null endpoints are fenced, not crashed on
    val withNull = Seq(("a", "b"), (null, "b"), ("a", null)).toDF("s", "t")
    assert(ranks(Graph.pageRankInt(withNull, col("s"), col("t"), iterations = 1))
      == Map("a" -> 150000L, "b" -> 1000000L))
  }

  test("rank is deterministic across partitionings (integer sums commute)") {
    // smallGraphEdgeLimit = 0 forces the DISTRIBUTED branch — the
    // partitioning-commutativity property is about that path
    val edges = (1 to 40).map(i => (s"n${i % 7}", s"n${(i * 3) % 7}"))
      .filter { case (a, b) => a != b }.toDF("s", "t")
    val one = ranks(Graph.pageRankInt(edges.coalesce(1), col("s"), col("t"),
      iterations = 3, smallGraphEdgeLimit = 0L))
    val many = ranks(Graph.pageRankInt(edges.repartition(13), col("s"), col("t"),
      iterations = 3, smallGraphEdgeLimit = 0L))
    assert(one == many)
  }

  test("edgesDistinct skips the dedup shuffle without changing ranks (r20)") {
    // already-distinct edges: the fast path must equal the default on
    // BOTH the driver and the distributed branch
    val edges = (1 to 60).map(i => (s"n${i % 11}", s"n${(i * 5) % 11}"))
      .filter { case (a, b) => a != b }.distinct.toDF("s", "t")
    val dflt = ranks(Graph.pageRankInt(edges, col("s"), col("t"), iterations = 3))
    val fast = ranks(Graph.pageRankInt(edges, col("s"), col("t"), iterations = 3,
      edgesDistinct = true))
    assert(dflt == fast)
    val dDist = ranks(Graph.pageRankInt(edges, col("s"), col("t"),
      iterations = 3, smallGraphEdgeLimit = 0L, edgesDistinct = true))
    assert(dflt == dDist)
  }

  test("driver fixed-point and distributed rounds are bit-identical") {
    val edges = (1 to 60).map(i => (s"n${i % 11}", s"n${(i * 5) % 11}"))
      .filter { case (a, b) => a != b }.toDF("s", "t")
    val driver = ranks(Graph.pageRankInt(edges, col("s"), col("t"), iterations = 3))
    val dist = ranks(Graph.pageRankInt(edges, col("s"), col("t"),
      iterations = 3, smallGraphEdgeLimit = 0L))
    assert(driver == dist)
    // long node ids route through the driver path unchanged
    val longEdges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("s", "t")
    val dl = Graph.pageRankInt(longEdges, col("s"), col("t"), iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ll = Graph.pageRankInt(longEdges, col("s"), col("t"), iterations = 2,
        smallGraphEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dl == ll)
  }
}
