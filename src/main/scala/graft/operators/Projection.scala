package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA fit + projection for embedding columns — the dimensionality-
  * reduction / whitening front-end of the vector pipeline (feeds
  * [[Quantization]] with decorrelated inputs, shrinks
  * [[Similarity]]'s distance loops, and turns [[Profiling.embeddingCovariance]]'s
  * redundancy diagnostic into an actionable transform).
  *
  * Fit is the classic two-phase shape: the cluster computes the
  * exact second-moment statistics (the engine's existing fixed-point
  * integer-sum pipelines — order- and partitioning-independent), the
  * driver eigendecomposes the dim×dim matrix (breeze `eigSym`,
  * public Spark dependency), and projection broadcasts the k×dim
  * component matrix back as literals — a pure map-side expression,
  * no shuffle, codegen-friendly HOFs.
  *
  * No DuckDB oracle on purpose: eigenvectors are sign- and
  * order-ambiguous across libraries, so cross-engine hash equality
  * is not meaningful; determinism WITHIN the engine is restored by
  * a fixed sign convention, and correctness is spec-pinned by the
  * linear-algebra invariants (components ∥ known directions,
  * projected variance = eigenvalue, rotation preserves centered
  * norms).
  *
  * Driver-pull bound: the fit collects dim per-dimension rows plus
  * dim·(dim−1)/2 covariance rows — config-sized for embedding
  * dims (4096-dim ⇒ ~8.4M tiny rows; practical ceiling ≈ a few
  * thousand dims, same as the covariance operator itself).
  */
object Projection {

  /** A fitted PCA basis: `components` is k rows × dim columns,
    * eigenvalue-descending, each row sign-fixed so its largest-
    * magnitude coordinate is positive.
    */
  final case class PcaModel(
      dim: Int,
      k: Int,
      mean: Array[Double],
      components: Array[Array[Double]],
      explainedVariance: Array[Double])

  /** Fit a k-component PCA of `vecCol` from the exact sample
    * covariance ([[Profiling.embeddingCovariance]] off-diagonal +
    * [[Profiling.profileEmbedding]] means/variances). Eager: runs
    * the two statistics jobs at call time.
    */
  def fitPca(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    // a single row makes the sample stddev divide by (n−1) = 0 inside
    // the statistics job (an opaque executor-side ANSI arithmetic
    // error) — check cheaply up front and fail with a clear message
    require(df.select(vecCol).limit(2).count() >= 2,
      "need at least 2 rows to fit a sample covariance")
    val stats = Profiling.profileEmbedding(df, vecCol)
      .select(col("dim"), col("mean"), col("stddev"), col("n"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getDouble(1), r.getDouble(2), r.getLong(3)))
    val dim = stats.length
    require(dim >= 1, "empty input: no dimensions to fit")
    require(k >= 1 && k <= dim, s"need 1 <= k <= $dim, got $k")
    // ragged vectors would silently corrupt the covariance assembly
    // (missing pair sums default to 0) — refuse loudly instead
    require(stats.map(_._4).distinct.length == 1,
      s"ragged $vecCol: per-dimension counts differ " +
        s"(${stats.map(_._4).min}..${stats.map(_._4).max}); " +
        "all vectors must share one length")
    val mean = Array.ofDim[Double](dim)
    val cov = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    stats.foreach { case (i, m, s, _) => mean(i) = m; cov(i, i) = s * s }
    Profiling.embeddingCovariance(df, vecCol)
      .select(col("dim_i"), col("dim_j"), col("cov"))
      .collect().foreach { r =>
        val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
        val c = r.getDouble(2)
        cov(i, j) = c
        cov(j, i) = c
      }
    val es = breeze.linalg.eigSym(cov)
    val order = (0 until dim).sortBy(i => -es.eigenvalues(i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(r => es.eigenvectors(r, c))
      // deterministic sign: the largest-|coordinate| entry is positive
      val pivot = v.indices.maxBy(i => math.abs(v(i)))
      if (v(pivot) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(dim, k, mean, comps,
      order.map(es.eigenvalues(_)).toArray)
  }

  /** Project `vecCol` onto the fitted basis: adds `outCol` =
    * `components · (x − mean)`, computed as k literal-vector dot
    * products (`zip_with` + `aggregate`) minus the precomputed
    * `components · mean` offsets — centering never materializes a
    * second vector. Map-side only; no shuffle at any input size.
    */
  def projectPca(
      df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "pca", whiten: Boolean = false): DataFrame = {
    val x = transform(col(vecCol), v => v.cast("double"))
    // whitening folds 1/√λ into the component vectors themselves, so
    // the per-row work is identical; a ~zero eigenvalue keeps scale 1
    // (an all-but-constant direction must not blow up to ±∞)
    val comps =
      if (!whiten) model.components
      else model.components.zip(model.explainedVariance).map { case (c, ev) =>
        val s = if (ev > 1e-12) 1.0 / math.sqrt(ev) else 1.0
        c.map(_ * s)
      }
    val offsets = comps.map(comp =>
      comp.zip(model.mean).map { case (a, b) => a * b }.sum)
    val ys = comps.zip(offsets).map { case (comp, off) =>
      aggregate(
        zip_with(x, typedLit(comp.toSeq), (a, b) => a * b),
        lit(0.0), (acc, p) => acc + p) - lit(off)
    }
    df.withColumn(outCol, array(ys.toIndexedSeq: _*))
  }
}
