package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Projection

/** PCA invariants (no cross-engine oracle — eigenbases are sign/
  * order-ambiguous across libraries; see Projection scaladoc): known
  * principal direction recovered, projected variance = eigenvalue,
  * full-rank projection is a centered isometry, deterministic sign.
  */
class ProjectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3-d data: dim1 = 2·dim0 + tiny noise (one dominant direction in
  // the (0,1) plane), dim2 independent small noise, nonzero means
  private lazy val vecs: Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(5)
    Seq.fill(400) {
      val t = rnd.nextGaussian()
      Seq(
        (1.0 + t + 0.01 * rnd.nextGaussian()).toFloat,
        (5.0 + 2.0 * t + 0.01 * rnd.nextGaussian()).toFloat,
        (-2.0 + 0.05 * rnd.nextGaussian()).toFloat)
    }
  }
  private lazy val df = vecs.map(Tuple1(_)).toDF("embedding")

  test("fit recovers the planted principal direction with descending eigenvalues") {
    val m = Projection.fitPca(df, "embedding", k = 3)
    assert(m.dim == 3 && m.k == 3)
    assert(m.explainedVariance.sliding(2).forall { case Array(a, b) => a >= b })
    // top component ∥ (1,2,0)/√5; sign convention makes coord 1 positive
    val c0 = m.components(0)
    val expected = Array(1.0 / math.sqrt(5), 2.0 / math.sqrt(5), 0.0)
    expected.indices.foreach(i => assert(math.abs(c0(i) - expected(i)) < 0.02,
      s"component0($i) = ${c0(i)}, expected ~${expected(i)}"))
    assert(math.abs(m.mean(1) - 5.0) < 0.2)
  }

  test("projected variance matches the eigenvalue; projection is centered") {
    val m = Projection.fitPca(df, "embedding", k = 2)
    val ys = Projection.projectPca(df, "embedding", m)
      .select($"pca").as[Seq[Double]].collect()
    (0 until 2).foreach { j =>
      val col = ys.map(_(j))
      val mean = col.sum / col.length
      val varr = col.map(v => (v - mean) * (v - mean)).sum / (col.length - 1)
      assert(math.abs(mean) < 1e-6, s"component $j not centered: $mean")
      assert(math.abs(varr - m.explainedVariance(j)) / m.explainedVariance(j) < 1e-6,
        s"component $j variance $varr vs eigenvalue ${m.explainedVariance(j)}")
    }
  }

  test("full-rank projection preserves centered norms (rotation, not distortion)") {
    val m = Projection.fitPca(df, "embedding", k = 3)
    val rows = Projection.projectPca(df, "embedding", m)
      .select($"embedding", $"pca")
      .as[(Seq[Float], Seq[Double])].collect()
    rows.take(50).foreach { case (x, y) =>
      val centered = x.map(_.toDouble).zip(m.mean).map { case (a, b) => a - b }
      val nx = centered.map(v => v * v).sum
      val ny = y.map(v => v * v).sum
      assert(math.abs(nx - ny) < 1e-6 * (1.0 + nx), s"norm $nx -> $ny")
    }
  }

  test("whitened projection has unit variance per component") {
    val m = Projection.fitPca(df, "embedding", k = 2)
    val ys = Projection.projectPca(df, "embedding", m, whiten = true)
      .select($"pca").as[Seq[Double]].collect()
    (0 until 2).foreach { j =>
      val col = ys.map(_(j))
      val mean = col.sum / col.length
      val varr = col.map(v => (v - mean) * (v - mean)).sum / (col.length - 1)
      assert(math.abs(varr - 1.0) < 1e-6, s"whitened var($j) = $varr")
    }
  }

  test("full-rank projection preserves L2 neighbor sets on the real corpus (ANN-safe rotation)") {
    // translation + rotation leave pairwise L2 distances untouched, so
    // k=dim PCA must return IDENTICAL nearest-neighbor sets — the
    // end-to-end guarantee that makes PCA a safe ANN pre-transform.
    // (A recall bound for k << dim is deliberately NOT pinned: the
    // synthetic corpus has a near-flat eigenspectrum — measured top
    // eigenvalues 0.029..0.023 of trace 1.0 — so low-rank recall is
    // data-dependent, not an operator property.)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .orderBy("vec_id").limit(200)
    val model = Projection.fitPca(emb, "embedding", k = 64)
    val rows = Projection.projectPca(emb, "embedding", model)
      .select($"vec_id", $"embedding", $"pca")
      .as[(Long, Seq[Float], Seq[Double])].collect()
    def topK(points: Array[(Long, Array[Double])], qi: Int, k: Int): Set[Long] = {
      val (qid, q) = points(qi)
      points.filter(_._1 != qid)
        .map { case (id, v) =>
          id -> v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum }
        .sortBy { case (id, dist) => (dist, id) }.take(k).map(_._1).toSet
    }
    val full = rows.map { case (id, x, _) => id -> x.map(_.toDouble).toArray }
    val red = rows.map { case (id, _, y) => id -> y.toArray }
    (0 until 20).foreach { qi =>
      assert(topK(full, qi, 10) == topK(red, qi, 10),
        s"query $qi: neighbor set changed under full-rank projection")
    }
  }

  test("fit is deterministic across runs (sign convention pins the basis)") {
    val a = Projection.fitPca(df, "embedding", k = 2)
    val b = Projection.fitPca(df, "embedding", k = 2)
    assert(a.components.flatten.toSeq == b.components.flatten.toSeq)
    assert(a.explainedVariance.toSeq == b.explainedVariance.toSeq)
  }

  test("fit refuses a single row: sample covariance needs n >= 2, not a silent NaN") {
    val one = Seq(Tuple1(Seq(1.0f, 2.0f, 3.0f))).toDF("embedding")
    val e = intercept[IllegalArgumentException] {
      Projection.fitPca(one, "embedding", k = 1)
    }
    assert(e.getMessage.contains("at least 2 rows"))
  }
}
