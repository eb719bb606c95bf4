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
  def saltedJoin(
      skewed: DataFrame, right: DataFrame, joinKeys: Seq[String],
      saltSource: Column, nSalts: Int): DataFrame = {
    val leftS = skewed.withColumn("_salt", pmod(xxhash64(saltSource), lit(nSalts)))
    val rightS = right.withColumn("_salt",
      explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    leftS.join(rightS, joinKeys :+ "_salt").drop("_salt")
  }
}
