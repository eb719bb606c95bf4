package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DqFunctions._

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Brute-force cosine top-k is the exact baseline: one scan, cosine
  * against a broadcast query vector, then `orderBy(...).limit(k)` —
  * which Spark plans as TakeOrderedAndProject (per-partition partial
  * top-k, merge of k·partitions rows on the driver), the right shape
  * at any scale: no global sort, no full shuffle.
  *
  * The scale path is LSH bucketing (random hyperplanes): vectors are
  * pre-bucketed; a query probes only buckets within a small Hamming
  * radius of its own bucket, turning top-k into a pruned scan.
  */
object Similarity {

  /** Cosine of every row against a constant query vector. */
  def cosineToQuery(vecCol: Column, query: Seq[Double]): Column =
    cosineSimilarity(vecCol, array(query.map(lit): _*))

  /** Exact top-k by cosine (ties broken by id for determinism). */
  def bruteForceTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol).as("id"),
        cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)

  /** Bucketed ANN: pre-bucket vectors by hyperplane sign bits, probe
    * the query's bucket plus all buckets within `probeHamming` bit
    * flips, brute-force only inside the probed buckets.
    *
    * Recall/cost dial: more planes → smaller buckets (cheaper, lower
    * recall); larger probeHamming → more buckets probed (costlier,
    * higher recall). Deterministic (fixed hyperplanes).
    */
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, dim: Int,
      planes: Int = 8, probeHamming: Int = 2): DataFrame = {
    val bucketed = df.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      Dedup.signBucket(col(vecCol), dim, planes, seedOffset = 0).as("bkt"))
    val qBucket = queryBucket(query, dim, planes)
    // enumerate probed buckets driver-side (tiny: Σ C(planes, ≤r))
    val probed = bucketsWithin(qBucket, planes, probeHamming)
    bucketed
      .filter(col("bkt").isin(probed: _*))
      .select(col("id"), cosineToQuery(col("v"), query).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** IVF-style ANN: coarse-quantize vectors to `nlist` centroids
    * (argmax cosine), probe the query's `nprobe` nearest centroids,
    * brute-force only inside probed cells.
    *
    * Centroids here are a deterministic id-ordered sample — at real
    * scale you train k-means once (e.g. MLlib) and persist the
    * centroid table; the assignment/probe machinery is identical.
    * The cell id is a plain column, so at rest it becomes a partition
    * key and probing becomes partition pruning.
    */
  def ivfTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    // deterministic centroid sample (1-row-per-centroid driver pull —
    // config-sized, like the reference's scalar-subquery lookups)
    val cents: Seq[(Int, Seq[Double])] = df
      .orderBy(col(idCol)).limit(nlist)
      .select(col(vecCol)).collect()
      .zipWithIndex.map { case (r, i) => i -> rowVecToDoubles(r) }.toSeq
    def centCol(c: Seq[Double]): Column = array(c.map(lit): _*)
    // assign: argmax cosine via array_max over (score, cell) structs
    val scored = array(cents.map { case (i, c) =>
      struct(cosineSimilarity(col(vecCol), centCol(c)).as("s"), lit(i).as("c"))
    }: _*)
    val assigned = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      array_max(scored).getField("c").as("cell"))
    // probe list: query's nprobe nearest centroids (driver math)
    val probed = cents.sortBy { case (_, c) => -cosDriver(query, c) }
      .take(nprobe).map(_._1)
    assigned
      .filter(col("cell").isin(probed: _*))
      .select(col("id"), cosineToQuery(col("v"), query).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** IVF with k-means-TRAINED centroids (MLlib `KMeans`, cosine
    * distance, fixed seed): the production variant of [[ivfTopK]]'s
    * deterministic-sample centroids. Training is a one-time batch job
    * (at scale: persist the model and reuse across queries); the
    * assignment/probe machinery is identical — cells come from
    * `model.transform`, the query probes its `nprobe` nearest
    * centroids, and only probed cells are scanned exactly.
    */
  def ivfTopKKMeans(
      df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // cached: KMeans.fit is iterative (each iteration re-reads the
    // input otherwise) and model.transform scans it once more; the
    // cache is released once the returned plan has executed (see
    // CacheLifecycle registration below)
    val feats = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
      .persist()
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setDistanceMeasure("cosine")
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(feats)
    val cents = model.clusterCenters.zipWithIndex
      .map { case (c, i) => i -> c.toArray.toSeq }
    val probed = cents.sortBy { case (_, c) => -cosDriver(query, c) }
      .take(nprobe).map(_._1)
    val out = model.transform(feats)
      .filter(col("cell").isin(probed.toIndexedSeq: _*))
      .select(col("id"), cosineToQuery(col("v"), query).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
    // registered AFTER fit: training's own executions are done, so the
    // first consuming execution left is the returned top-k plan
    graft.CacheLifecycle.releaseAfterFirstUse(Seq(feats))
    out
  }

  /** Driver-side cosine for centroid ranking (config-sized inputs). */
  private def cosDriver(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na > 0 && nb > 0) d / (na * nb) else -1.0
  }

  /** Element-type-agnostic driver-side vector extraction (ARRAY<FLOAT>
    * and ARRAY<DOUBLE> are both first-class across the vector API).
    */
  def rowVecToDoubles(r: org.apache.spark.sql.Row): Seq[Double] =
    r.getSeq[Any](0).map {
      case f: java.lang.Float  => f.toDouble
      case d: java.lang.Double => d.doubleValue
      case other => throw new IllegalArgumentException(
        s"vector element must be float/double, got ${other.getClass}")
    }

  /** The query vector's own sign bucket (same hyperplanes as rows). */
  private[graft] def queryBucket(query: Seq[Double], dim: Int, planes: Int): Long = {
    val ps = Dedup.hyperplanes(dim, planes, seedOffset = 0)
    ps.zipWithIndex.foldLeft(0L) { case (acc, (plane, j)) =>
      val dot = query.zip(plane).map { case (a, b) => a * b }.sum
      if (dot >= 0) acc | (1L << j) else acc
    }
  }

  /** All bucket codes within Hamming distance ≤ r of `bucket`. */
  private[graft] def bucketsWithin(bucket: Long, planes: Int, r: Int): Seq[Long] =
    (0 to r).flatMap(d =>
      (0 until planes).combinations(d).map(_.foldLeft(bucket)((b, i) => b ^ (1L << i))))
      .distinct
}
