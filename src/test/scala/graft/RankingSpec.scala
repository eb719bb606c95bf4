package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ranking, Similarity}

class RankingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runDf = Seq(
    // q1: a hit at rank 1, b hit at rank 3, x/y noise
    (1L, "a", 0.9), (1L, "x", 0.8), (1L, "b", 0.7), (1L, "y", 0.6),
    // q2: nothing relevant retrieved (truth is {c})
    (2L, "d", 0.9), (2L, "e", 0.5),
    // q3: unjudged query — no truth rows, must NOT appear
    (3L, "z", 1.0)).toDF("qid", "item", "score")

  private def truthDf = Seq(
    (1L, "a"), (1L, "b"), (2L, "c")).toDF("qid", "item")

  // ---------------- retrievalQuality ----------------

  test("retrievalQuality: hand-computed hits/precision/recall/rr at k=3") {
    val out = Ranking.retrievalQuality(runDf, truthDf, "qid", "item", "score", k = 3)
      .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    val q1 = out(1L)
    assert(q1.getAs[Long]("n_rel") == 2L && q1.getAs[Long]("n_ret") == 3L)
    assert(q1.getAs[Long]("hits") == 2L)
    assert(q1.getAs[Double]("precision_at_k") == 2.0 / 3.0)
    assert(q1.getAs[Double]("recall_at_k") == 1.0)
    assert(q1.getAs[Long]("first_rel_rank") == 1L)
    assert(q1.getAs[Double]("rr") == 1.0)
    val q2 = out(2L)
    assert(q2.getAs[Long]("n_rel") == 1L && q2.getAs[Long]("n_ret") == 2L)
    assert(q2.getAs[Long]("hits") == 0L)
    assert(q2.getAs[Double]("precision_at_k") == 0.0)
    assert(q2.getAs[Double]("recall_at_k") == 0.0)
    assert(q2.isNullAt(q2.fieldIndex("first_rel_rank")))
    assert(q2.isNullAt(q2.fieldIndex("rr")))
  }

  test("retrievalQuality: a query the run missed entirely still reports hits=0") {
    val truth = truthDf.union(Seq((9L, "m")).toDF("qid", "item"))
    val out = Ranking.retrievalQuality(runDf, truth, "qid", "item", "score", k = 3)
      .filter($"query_id" === 9L).head()
    assert(out.getAs[Long]("n_rel") == 1L && out.getAs[Long]("n_ret") == 0L)
    assert(out.getAs[Long]("hits") == 0L)
    assert(out.getAs[Double]("recall_at_k") == 0.0)
    assert(out.isNullAt(out.fieldIndex("rr")))
  }

  test("retrievalQuality: duplicate truth judgments don't double-count") {
    val dupTruth = truthDf.union(truthDf) // every pair twice
    val a = Ranking.retrievalQuality(runDf, truthDf, "qid", "item", "score", 3)
      .orderBy("query_id").collect().toSeq
    val b = Ranking.retrievalQuality(runDf, dupTruth, "qid", "item", "score", 3)
      .orderBy("query_id").collect().toSeq
    assert(a == b)
  }

  test("retrievalQuality: cutoff excludes hits past rank k; score ties break by item asc") {
    // truth item b sits at rank 3 (ties broken: a < b at equal score)
    val run = Seq((1L, "b", 0.5), (1L, "a", 0.5), (1L, "c", 0.9)).toDF("qid", "item", "score")
    val truth = Seq((1L, "b")).toDF("qid", "item")
    val k2 = Ranking.retrievalQuality(run, truth, "qid", "item", "score", k = 2).head()
    assert(k2.getAs[Long]("hits") == 0L) // b ranked 3rd: c(1), a(2), b(3)
    val k3 = Ranking.retrievalQuality(run, truth, "qid", "item", "score", k = 3).head()
    assert(k3.getAs[Long]("hits") == 1L && k3.getAs[Long]("first_rel_rank") == 3L)
    assert(k3.getAs[Double]("rr") == 1.0 / 3.0)
  }

  // ---------------- discountsQ ----------------

  test("discountsQ: rank-1 discount is exactly 1e12; strictly decreasing") {
    val d = Ranking.discountsQ(10)
    assert(d.head == 1000000000000L)
    assert(d == d.sorted.reverse && d.distinct == d)
    assert(d.forall(x => x > 0 && x <= 1000000000000L))
  }

  // ---------------- ndcgAtK ----------------

  test("ndcgAtK: ideal-ordered run scores exactly 1.0; swapped order less") {
    val truth = Seq((1L, "a", 3L), (1L, "b", 2L), (1L, "c", 1L))
      .toDF("qid", "item", "gain")
    val ideal = Seq((1L, "a", 0.9), (1L, "b", 0.8), (1L, "c", 0.7))
      .toDF("qid", "item", "score")
    val r1 = Ranking.ndcgAtK(ideal, truth, "qid", "item", "score", "gain", 3).head()
    assert(r1.getAs[Double]("ndcg") == 1.0)
    val swapped = Seq((1L, "b", 0.9), (1L, "a", 0.8), (1L, "z", 0.7))
      .toDF("qid", "item", "score")
    val d = Ranking.discountsQ(3)
    val r2 = Ranking.ndcgAtK(swapped, truth, "qid", "item", "score", "gain", 3).head()
    val expDcg = 2L * d(0) + 3L * d(1) // b then a; z gains 0
    val expIdcg = 3L * d(0) + 2L * d(1) + 1L * d(2)
    assert(r2.getAs[Long]("dcg_q") == expDcg)
    assert(r2.getAs[Long]("idcg_q") == expIdcg)
    assert(r2.getAs[Double]("ndcg") == expDcg.toDouble / expIdcg.toDouble)
  }

  test("ndcgAtK: all-zero gains give NULL ndcg; run-only queries absent") {
    val truth = Seq((1L, "a", 0L), (1L, "b", 0L)).toDF("qid", "item", "gain")
    val run = Seq((1L, "a", 0.9), (2L, "b", 0.8)).toDF("qid", "item", "score")
    val out = Ranking.ndcgAtK(run, truth, "qid", "item", "score", "gain", 3)
    val rows = out.collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSet == Set(1L))
    assert(rows.head.isNullAt(rows.head.fieldIndex("ndcg")))
  }

  test("ndcgAtK: ideal ranking uses only the query's own truth, cut at k") {
    // 4 truth items, k=2: IDCG takes the top-2 gains (5, 4)
    val truth = Seq((1L, "a", 5L), (1L, "b", 4L), (1L, "c", 3L), (1L, "d", 2L))
      .toDF("qid", "item", "gain")
    val run = Seq((1L, "a", 0.9), (1L, "b", 0.8)).toDF("qid", "item", "score")
    val d = Ranking.discountsQ(2)
    val r = Ranking.ndcgAtK(run, truth, "qid", "item", "score", "gain", 2).head()
    assert(r.getAs[Long]("idcg_q") == 5L * d(0) + 4L * d(1))
    assert(r.getAs[Double]("ndcg") == 1.0)
  }

  // ---------------- retrievalSummary ----------------

  test("retrievalSummary: exact macro means; missed queries fold rr = 0") {
    val pq = Ranking.retrievalQuality(runDf, truthDf, "qid", "item", "score", 3)
    val s = Ranking.retrievalSummary(pq, k = 3).head()
    assert(s.getAs[Long]("n_queries") == 2L && s.getAs[Long]("n_hit") == 1L)
    // meanP = (2/3 + 0)/2 quantized at 1e-12 (floor), meanR/mrr exact
    assert(math.abs(s.getAs[Double]("mean_precision_at_k") - 1.0 / 3.0) < 1e-9)
    assert(s.getAs[Double]("mean_recall_at_k") == 0.5)
    assert(s.getAs[Double]("mrr") == 0.5)
  }

  // ---------------- integration: a perfect index evals perfect ----------------

  test("run == truth (brute vs itself): recall@k = 1 and ndcg = 1 for every query") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 7 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val brute = Similarity.annJoinBrute(
      queries = vecs.filter($"vec_id" % 10 === 0),
      corpus = vecs.filter($"vec_id" % 10 =!= 0),
      idCol = "vec_id", vecCol = "embedding", k = 3)
    val rq = Ranking.retrievalQuality(
      brute, brute.select("query_id", "neighbor_id"),
      "query_id", "neighbor_id", "cosine", k = 3)
    assert(rq.count() == 4L)
    assert(rq.filter($"recall_at_k" =!= 1.0 || $"rr" =!= 1.0).isEmpty)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id".asc)
    val graded = brute.withColumn("gain", (lit(4) - row_number().over(w)).cast("long"))
    val nd = Ranking.ndcgAtK(brute, graded,
      "query_id", "neighbor_id", "cosine", "gain", k = 3)
    assert(nd.count() == 4L)
    assert(nd.filter($"ndcg" =!= 1.0).isEmpty)
  }
}
