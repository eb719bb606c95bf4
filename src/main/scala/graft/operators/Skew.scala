package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SCALE.md): structural fixes for hot
  * keys that AQE's runtime skew handling can't reach.
  *
  * Plain counts/sums don't need salting — Spark's partial aggregation
  * already combines map-side. Salting matters for (a) DISTINCT
  * aggregation, where one hot group funnels every distinct value
  * through one reducer, and (b) joins where one key dominates.
  */
object Skew {

  /** Exact distinct count per group, spread over `nSalts` reducers by
    * salting on the HASH OF THE VALUE — value-hash salting keeps each
    * distinct value in exactly one salt partition, so per-salt
    * distinct counts are disjoint and sum exactly. A hot group's
    * distinct set is processed by nSalts reducers instead of one.
    */
  def saltedDistinctCount(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      nSalts: Int): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(col(valueCol)), lit(nSalts)))
    salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(count_distinct(col(valueCol)).as("_dc"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("_dc").cast("long").as("distinct_count"))
  }

  /** Salted equi-join for a skewed left side: the left side salts on
    * a row-unique column (spreading a hot join key across nSalts
    * partitions); the right side replicates each row nSalts times.
    * Results are identical to the plain join; the hot key's work is
    * parallelized at the cost of replicating the (small) right side.
    */
  /** Join-skew diagnosis: per-key frequency census of both join
    * sides and each key's output contribution (`n_left × n_right` —
    * the row count that key alone would emit from the join), top-k
    * hottest keys first. Run this BEFORE a big join to decide
    * whether it needs [[saltedJoin]]/AQE skew handling, and which
    * keys are the problem.
    *
    * Scale: both sides partial-aggregate map-side down to one row
    * per distinct key before the full-outer merge, and the final
    * ordering is `orderBy(...).limit(k)` — Spark plans that as
    * TakeOrderedAndProject (per-partition top-k, then a k-row merge
    * on the driver), never a global sort. Ties break on the key, so
    * the top-k set is deterministic.
    */
  def joinSkewReport(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val l = left.select(leftKey.as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_left"))
    val r = right.select(rightKey.as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_right"))
    l.join(r, Seq("k"), "full_outer")
      .select(
        col("k"),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"),
        (coalesce(col("n_left"), lit(0L)) * coalesce(col("n_right"), lit(0L)))
          .as("n_output"))
      .orderBy(col("n_output").desc, col("k").asc)
      .limit(topK)
  }

  def saltedJoin(
      skewed: DataFrame, right: DataFrame, joinKeys: Seq[String],
      saltSource: Column, nSalts: Int): DataFrame = {
    val leftS = skewed.withColumn("_salt", pmod(xxhash64(saltSource), lit(nSalts)))
    val rightS = right.withColumn("_salt",
      explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    leftS.join(rightS, joinKeys :+ "_salt").drop("_salt")
  }
}
