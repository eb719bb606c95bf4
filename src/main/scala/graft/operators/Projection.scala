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
  * Driver-pull bound: the EXACT fit collects dim per-dimension rows
  * plus dim·(dim−1)/2 covariance rows — config-sized for embedding
  * dims (4096-dim ⇒ ~8.4M tiny rows; practical ceiling ≈ a few
  * thousand dims, same as the covariance operator itself). Above
  * [[fitPca]]'s `dimThreshold` the matrix-free subspace iteration
  * ([[fitPcaIterative]]) takes over: O(k·dim) driver state per
  * iteration, no covariance materialization, so very high-dim
  * embeddings (8k+) fit without the quadratic pull.
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

  /** Fit a k-component PCA of `vecCol`. Dispatches on dimensionality:
    * at or below `dimThreshold` the exact path assembles the full
    * sample covariance and eigendecomposes it on the driver
    * ([[fitPcaExact]], O(dim²) driver pull); above it, the matrix-free
    * subspace iteration ([[fitPcaIterative]]) never materializes the
    * covariance — each iteration is ONE aggregate over the rows and
    * the driver state is O(k·dim). Both paths share the model shape,
    * eigenvalue ordering, and sign convention.
    */
  def fitPca(df: DataFrame, vecCol: String, k: Int,
      dimThreshold: Int = 512): PcaModel = {
    // dim probe (cheap; the fit is eager anyway). A null-filtered
    // aggregate, NOT limit(1): limit on a multi-partition frame
    // returns an arbitrary row — a null or short first vector would
    // make the exact-vs-iterative dispatch nondeterministic (or NPE).
    // max(size) ignores nulls and is stable; ragged inputs still hit
    // the loud per-path require downstream.
    val probed = df.select(max(size(col(vecCol))).as("_d")).collect()(0)
    require(!probed.isNullAt(0), "empty input: no non-null vectors to fit")
    val dim = probed.getInt(0)
    if (dim <= dimThreshold) fitPcaExact(df, vecCol, k)
    else fitPcaIterative(df, vecCol, k)
  }

  /** Exact fit from the full sample covariance
    * ([[Profiling.embeddingCovariance]] off-diagonal +
    * [[Profiling.profileEmbedding]] means/variances). Eager: runs
    * the two statistics jobs at call time. Driver pull is O(dim²) —
    * the few-thousand-dim ceiling documented above; beyond it use
    * [[fitPcaIterative]].
    */
  def fitPcaExact(df: DataFrame, vecCol: String, k: Int): PcaModel = {
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
      signFix(v)
    }.toArray
    PcaModel(dim, k, mean, comps,
      order.map(es.eigenvalues(_)).toArray)
  }

  /** Matrix-free top-k PCA by blocked subspace (orthogonal) iteration
    * with a final Rayleigh–Ritz rotation — the high-dimensional path
    * that never materializes the dim×dim covariance.
    *
    * Each iteration computes Y = C·Qᵀ for the current k′×dim basis Q
    * (k′ = k + 2 oversampled columns sharpen the k-th component's
    * convergence) WITHOUT forming C: per row, the centered projection
    * d_j = x·q_j − mean·q_j is a literal-vector dot product, and
    * Y_j = (Σ d_j·x − (Σ d_j)·mean) / (n−1) folds as one
    * posexplode-keyed aggregate — the same partial-aggregation shape
    * as [[Profiling.profileEmbedding]], so each task emits ≤ dim
    * partial rows regardless of input size and the driver pulls
    * O(k·dim) per iteration, never O(dim²). The driver then
    * re-orthonormalizes (modified Gram–Schmidt) and repeats;
    * convergence is geometric in the eigengap ratio. A final k′×k′
    * Rayleigh–Ritz eigensolve (breeze, driver-side — trivially
    * sized) rotates the subspace onto the eigenvectors and yields
    * the eigenvalues.
    *
    * Deterministic: fixed-seed gaussian init, fixed iteration count,
    * the engine's order-deterministic dot products. Same sign
    * convention as the exact path; the spec pins component-wise
    * agreement with `eigSym` of the exact covariance at dim ≥ 1024.
    */
  def fitPcaIterative(df: DataFrame, vecCol: String, k: Int,
      iters: Int = 30, seed: Long = 42L): PcaModel = {
    val stats = Profiling.profileEmbedding(df, vecCol)
      .select(col("dim"), col("mean"), col("n"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getDouble(1), r.getLong(2)))
    val dim = stats.length
    require(dim >= 1, "empty input: no dimensions to fit")
    require(k >= 1 && k <= dim, s"need 1 <= k <= $dim, got $k")
    require(stats.map(_._3).distinct.length == 1,
      s"ragged $vecCol: per-dimension counts differ; all vectors must share one length")
    val n = stats.head._3
    require(n >= 2, s"need at least 2 rows to fit a sample covariance, got $n")
    val mean = Array.ofDim[Double](dim)
    stats.foreach { case (i, m, _) => mean(i) = m }

    val kP = math.min(k + 2, dim)
    val x = transform(col(vecCol), e => e.cast("double"))

    // Y = C·Qᵀ without C: one scan, one grouped aggregate, O(k·dim) pull
    def covTimes(q: Array[Array[Double]]): Array[Array[Double]] = {
      val dCols = q.zipWithIndex.map { case (qj, j) =>
        val off = qj.zip(mean).map { case (a, b) => a * b }.sum
        (graft.functions.DqFunctions.dotProduct(x, typedLit(qj.toSeq)) - lit(off))
          .as(s"_d$j")
      }
      val aggs = q.indices.flatMap(j => Seq(
        sum(col("col") * col(s"_d$j")).as(s"_s$j"),
        // Σ d_j is pos-independent; folding it inside the same grouped
        // aggregate avoids a second scan (each pos group sees every row)
        sum(col(s"_d$j")).as(s"_t$j")))
      val rows = df.select((dCols :+ posexplode(x)).toIndexedSeq: _*)
        .groupBy(col("pos"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      val y = Array.ofDim[Double](q.length, dim)
      rows.foreach { r =>
        val p = r.getInt(r.fieldIndex("pos"))
        q.indices.foreach { j =>
          val s = r.getDouble(r.fieldIndex(s"_s$j"))
          val t = r.getDouble(r.fieldIndex(s"_t$j"))
          y(j)(p) = (s - t * mean(p)) / (n - 1.0)
        }
      }
      y
    }

    // fixed-seed gaussian init, orthonormalized
    val rnd = new scala.util.Random(seed)
    var q = orthonormalize(Array.fill(kP, dim)(rnd.nextGaussian()))
    (1 to iters).foreach { _ => q = orthonormalize(covTimes(q)) }
    // Rayleigh–Ritz: project C into span(q) and eigensolve the small block
    val y = covTimes(q)
    val b = breeze.linalg.DenseMatrix.tabulate(kP, kP) { (i, j) =>
      // symmetrize against iteration-order rounding
      val bij = dot(q(i), y(j)); val bji = dot(q(j), y(i)); (bij + bji) / 2.0
    }
    val es = breeze.linalg.eigSym(b)
    val order = (0 until kP).sortBy(i => -es.eigenvalues(i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(p =>
        (0 until kP).map(i => es.eigenvectors(i, c) * q(i)(p)).sum)
      signFix(v)
    }.toArray
    PcaModel(dim, k, mean, comps, order.map(es.eigenvalues(_)).toArray)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Deterministic sign: the largest-|coordinate| entry is positive. */
  private def signFix(v: Array[Double]): Array[Double] = {
    val pivot = v.indices.maxBy(i => math.abs(v(i)))
    if (v(pivot) < 0) v.map(x => -x) else v
  }

  /** Modified Gram–Schmidt with re-orthogonalization; rows of `m`
    * in, orthonormal rows out. A numerically dead row (norm ~ 0
    * after projection) is replaced by a deterministic unit basis
    * vector so the subspace never collapses.
    */
  private def orthonormalize(m: Array[Array[Double]]): Array[Array[Double]] = {
    val out = m.map(_.clone())
    out.indices.foreach { i =>
      // twice is enough (Kahan): re-project to kill rounding leakage
      (0 until 2).foreach { _ =>
        (0 until i).foreach { j =>
          val c = dot(out(i), out(j))
          var p = 0
          while (p < out(i).length) { out(i)(p) -= c * out(j)(p); p += 1 }
        }
      }
      val nrm = math.sqrt(dot(out(i), out(i)))
      if (nrm > 1e-12) {
        var p = 0
        while (p < out(i).length) { out(i)(p) /= nrm; p += 1 }
      } else {
        java.util.Arrays.fill(out(i), 0.0)
        out(i)(i % out(i).length) = 1.0
      }
    }
    out
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
