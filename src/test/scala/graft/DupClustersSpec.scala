package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** duplicateClusters = connected components over a pair list. Pinned
  * against a driver-side union-find on randomized graphs, plus the
  * shapes that stress convergence (long paths — worst-case diameter)
  * and bookkeeping (empty input, self-pairs, duplicate pairs).
  */
class DupClustersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bruteComponents(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byRoot = parent.keys.toSeq.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val cid = members.min
      members.map(m => m -> (cid, members.size.toLong))
    }.toMap
  }

  private def run(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Dedup.duplicateClusters(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("matches union-find on randomized graphs") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      val pairs = Seq.fill(n) {
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      }.filter { case (a, b) => a != b }
      assert(run(pairs) == bruteComponents(pairs), s"trial $trial: $pairs")
    }
  }

  test("long path converges well under the round cap (pointer doubling)") {
    // a 200-node path has diameter 199; naive propagation needs ~200
    // rounds, compression must land it far below the default cap of 50.
    // smallGraphEdgeLimit = 0 forces the DISTRIBUTED branch — the
    // default would route this fixture to the driver union-find
    val pairs = (0L until 199L).map(i => (i, i + 1))
    val got = Dedup.duplicateClusters(pairs.toDF("id_a", "id_b"), "id_a", "id_b",
        smallGraphEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == (0L to 199L).toSet)
    assert(got.values.forall { case (cid, sz) => cid == 0L && sz == 200L })
  }

  test("driver union-find and distributed propagation label identically") {
    val rnd = new Random(7)
    val pairs = Seq.fill(300) {
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
    }.filter { case (a, b) => a != b }
    val driver = run(pairs) // default limit: driver path
    val distributed = Dedup.duplicateClusters(
        pairs.toDF("id_a", "id_b"), "id_a", "id_b", smallGraphEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(driver == distributed)
    assert(driver == bruteComponents(pairs))
  }

  test("disjoint components keep distinct min-id labels and sizes") {
    val got = run(Seq((5L, 3L), (3L, 9L), (20L, 21L)))
    assert(got == Map(
      3L -> (3L, 3L), 5L -> (3L, 3L), 9L -> (3L, 3L),
      20L -> (20L, 2L), 21L -> (20L, 2L)))
  }

  test("empty and degenerate inputs") {
    assert(run(Seq.empty) == Map.empty)
    // self-pairs and duplicated pairs collapse to singleton semantics
    assert(run(Seq((7L, 7L))) == Map(7L -> (7L, 1L)))
    assert(run(Seq((1L, 2L), (2L, 1L), (1L, 2L))) ==
      Map(1L -> (1L, 2L), 2L -> (1L, 2L)))
  }

  test("string ids cluster via long surrogate, never a silent cast") {
    // a long cast of these keys would null out and silently drop every
    // edge; the surrogate path must keep the components intact
    val pairs = Seq(("doc-a", "doc-b"), ("doc-b", "doc-c"), ("u-1", "u-2"))
      .toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs, "id_a", "id_b")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got.keySet == Set("doc-a", "doc-b", "doc-c", "u-1", "u-2"))
    val abc = Set("doc-a", "doc-b", "doc-c").map(got)
    assert(abc.size == 1 && abc.head._2 == 3L,
      s"doc-a/b/c share one representative: $got")
    assert(Set("doc-a", "doc-b", "doc-c").contains(abc.head._1),
      "the representative is a member of its own cluster")
    val uv = Set("u-1", "u-2").map(got)
    assert(uv.size == 1 && uv.head._2 == 2L && Set("u-1", "u-2").contains(uv.head._1))
  }

  test("reliable-checkpoint path produces identical clusters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val pairs = Seq((5L, 3L), (3L, 9L), (20L, 21L), (1L, 9L))
    val reliable = Dedup.duplicateClusters(pairs.toDF("id_a", "id_b"),
        "id_a", "id_b", checkpointDir = Some(dir), smallGraphEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(reliable == run(pairs))
    // the rounds really went to reliable storage
    assert(new java.io.File(dir).listFiles().nonEmpty,
      "checkpointDir must contain checkpoint data")
  }

  test("superseded rounds release their blocks (no per-round cache accumulation)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    // diameter-199 path: many propagation rounds, each localCheckpointed
    // (distributed branch forced — the driver path has no rounds)
    val out = Dedup.duplicateClusters(
      (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b"), "id_a", "id_b",
      smallGraphEdgeLimit = 0L)
    out.count()
    val after = spark.sparkContext.getPersistentRDDs.size
    // only the FINAL labels snapshot may remain (edges are unpersisted,
    // prior rounds released); anything proportional to round count is
    // the leak this pins
    assert(after - before <= 1,
      s"persistent RDDs grew $before -> $after; superseded rounds must unpersist")
  }

  test("q128 keep list: exactly one keep per cluster, and it is the best-quality member") {
    val r = graft.queries.ExtensionQueries
      .q128ClusterKeepList(spark, TestSpark.sf).collect()
    assert(r.nonEmpty)
    val byCluster = r.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      val keeps = members.filter(_.getAs[Boolean]("keep"))
      assert(keeps.length == 1, s"cluster $cid must keep exactly one member")
      val kept = keeps.head
      // the kept member maximizes (logit, then lowest doc_id)
      val best = members.maxBy(m =>
        (m.getAs[Double]("logit"), -m.getAs[Long]("doc_id")))
      assert(kept.getAs[Long]("doc_id") == best.getAs[Long]("doc_id"),
        s"cluster $cid kept a non-optimal member")
      // cluster_size is consistent with the observed membership
      assert(members.forall(_.getAs[Long]("cluster_size") == members.length))
    }
  }
}
