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

  test("iterative fit at dim 1024 matches eigSym of the exact covariance to 1e-6") {
    // planted spectrum with strong gaps so subspace iteration's
    // geometric convergence is far below the tolerance by 30 rounds
    val dim = 1024
    val rnd = new scala.util.Random(11)
    def unit(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val u1 = unit(); val u2 = unit(); val u3 = unit()
    val rows = Seq.fill(220) {
      val (g1, g2, g3) = (rnd.nextGaussian(), rnd.nextGaussian(), rnd.nextGaussian())
      Array.tabulate(dim)(p =>
        (10.0 * g1 * u1(p) + 5.0 * g2 * u2(p) + 2.0 * g3 * u3(p) +
          0.001 * rnd.nextGaussian()).toFloat).toSeq
    }
    val df = rows.map(Tuple1(_)).toDF("embedding")
    // dim > the 512 threshold: fitPca must take the iterative path
    val m = Projection.fitPca(df, "embedding", k = 3)
    assert(m.dim == dim && m.k == 3)
    // reference: breeze eigSym of the exact sample covariance of the
    // SAME data, computed driver-side (220×1024 fits trivially)
    import breeze.linalg.{`*` => bAll, DenseMatrix, sum => bSum}
    val X = DenseMatrix.tabulate(rows.length, dim)(
      (i, j) => rows(i)(j).toDouble)
    val mu = bSum(X(::, bAll)).t / rows.length.toDouble
    val Xc = X(bAll, ::) - mu
    val cov = (Xc.t * Xc) / (rows.length - 1).toDouble
    val es = breeze.linalg.eigSym(cov)
    val order = (0 until dim).sortBy(i => -es.eigenvalues(i)).take(3)
    order.zipWithIndex.foreach { case (c, j) =>
      val ref0 = Array.tabulate(dim)(r => es.eigenvectors(r, c))
      val pivot = ref0.indices.maxBy(i => math.abs(ref0(i)))
      val ref = if (ref0(pivot) < 0) ref0.map(x => -x) else ref0
      val got = m.components(j)
      val maxDiff = ref.indices.map(i => math.abs(ref(i) - got(i))).max
      assert(maxDiff < 1e-6, s"component $j: max coordinate diff $maxDiff")
      assert(math.abs(m.explainedVariance(j) - es.eigenvalues(c))
        / es.eigenvalues(c) < 1e-9,
        s"eigenvalue $j: ${m.explainedVariance(j)} vs ${es.eigenvalues(c)}")
    }
  }

  test("iterative and exact paths agree on the small fixture") {
    val exact = Projection.fitPcaExact(df, "embedding", k = 2)
    val iter = Projection.fitPcaIterative(df, "embedding", k = 2)
    (0 until 2).foreach { j =>
      // the paths eigendecompose slightly different covariance
      // representations (fixed-point quantized sums vs plain double
      // dots); eigenvector sensitivity is perturbation/eigengap, so
      // agreement lands near 1e-7 on this fixture — pin the headline
      // 1e-6, not machine epsilon
      val diff = exact.components(j).zip(iter.components(j))
        .map { case (a, b) => math.abs(a - b) }.max
      assert(diff < 1e-6, s"component $j drifted between paths: $diff")
      assert(math.abs(exact.explainedVariance(j) - iter.explainedVariance(j))
        / exact.explainedVariance(j) < 1e-7)
    }
  }

  test("fit refuses a single row: sample covariance needs n >= 2, not a silent NaN") {
    val one = Seq(Tuple1(Seq(1.0f, 2.0f, 3.0f))).toDF("embedding")
    val e = intercept[IllegalArgumentException] {
      Projection.fitPca(one, "embedding", k = 1)
    }
    assert(e.getMessage.contains("at least 2 rows"))
  }
}
