package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus scale-up for the SCALE REHEARSAL (SCALE.md): writes a
  * `copies`× salted replica of a driver corpus so the heavy-tail
  * queries can be executed above sf0.1 and their measured scaling
  * exponents recorded — the empirical check behind every "this plan
  * survives 100×" claim.
  *
  * Salting discipline (all deterministic, no RNG):
  *  - every key column shifts by `i × stride(table)` with strides
  *    rounded to a power of ten above the observed max, so copy
  *    membership is readable off a key and FK consistency holds
  *    (orders.o_custkey moves WITH customer.c_custkey, lineitem's
  *    three FKs move with their parents);
  *  - `documents.text` gets a per-copy word substitution — words
  *    whose xxhash64(word, copy) ≡ 0 (mod 3) gain a copy suffix — so
  *    cross-copy pairs fall BELOW near-dup thresholds (P[5-shingle
  *    survives] ≈ 0.7⁵ ≈ 0.17) while each copy's INTERNAL dup/near-
  *    dup structure is preserved exactly (the same substitution maps
  *    within-copy duplicates to identical outputs);
  *  - `embeddings.embedding` gets a bounded ±0.005 ADDITIVE
  *    per-coordinate deterministic jitter (approximately
  *    norm-preserving for the unit-scale test embeddings; small
  *    coordinates see a larger relative change), keeping cluster
  *    geometry
  *    while keeping copies distinct;
  *  - dimension tables (region, nation) are copied once — at any
  *    scale they stay broadcast-sized, and inflating them would
  *    change plan shapes for no rehearsal value.
  *
  * Copy 0 is byte-value-identical to the source (identity salt), so
  * the scaled corpus strictly contains the original.
  *
  * Usage: `runMain graft.ScaleUp <srcDir> <destDir> [copies=10]`
  */
object ScaleUp {

  private def pow10Above(n: Long): Long = {
    var s = 1L
    while (s <= n) s *= 10
    s
  }

  private[graft] def saltWords(text: Column, copy: Int): Column =
    if (copy == 0) text
    else array_join(
      transform(split(text, " "),
        w => when(pmod(xxhash64(w, lit(copy)), lit(3)) === 0L,
          concat(w, lit("x"), lit(copy))).otherwise(w)),
      " ")

  private[graft] def jitterVec(vec: Column, id: Column, copy: Int): Column =
    if (copy == 0) vec
    else transform(vec, (x, j) =>
      (x + ((pmod(xxhash64(id, j, lit(copy)), lit(1000L)).cast("double")
        / lit(1000.0) - lit(0.5)) * lit(0.01)).cast("float")).cast("float"))

  /** Union `copies` salted replicas of `df`, shifting each column in
    * `keyStrides` by `copy × stride` and applying `extra` to each
    * copy's frame. */
  private def replicate(
      df: DataFrame, copies: Int, keyStrides: Map[String, Long],
      extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
    (0 until copies).map { i =>
      val shifted = keyStrides.foldLeft(df) { case (d, (k, stride)) =>
        d.withColumn(k, col(k) + lit(i * stride))
      }
      extra(shifted, i)
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <destDir> [copies]")
    val (src, dest) = (args(0), args(1))
    val copies = if (args.length > 2) args(2).toInt else 10
    require(copies >= 1, s"copies must be >= 1, got $copies")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0)

    val customer = Tables.customer(spark, src)
    val orders = Tables.orders(spark, src)
    val part = Tables.part(spark, src)
    val supplier = Tables.supplier(spark, src)
    val docs = Tables.documents(spark, src)
    val emb = Tables.embeddings(spark, src)
    val events = Tables.events(spark, src)

    val cStride = pow10Above(maxOf(customer, "c_custkey"))
    val oStride = pow10Above(maxOf(orders, "o_orderkey"))
    val pStride = pow10Above(maxOf(part, "p_partkey"))
    val sStride = pow10Above(maxOf(supplier, "s_suppkey"))
    val dStride = pow10Above(maxOf(docs, "doc_id"))
    val vStride = pow10Above(maxOf(emb, "vec_id"))
    val eStride = pow10Above(maxOf(events, "event_id"))
    val uStride = pow10Above(maxOf(events, "user_id"))

    def write(df: DataFrame, name: String, parts: Int,
        factor: Int = copies): Unit = {
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dest/$name.parquet")
      println(s"[scaleup] wrote $name x$factor")
    }

    // dimensions: copied once
    write(Tables.region(spark, src), "region", 1, factor = 1)
    write(Tables.nation(spark, src), "nation", 1, factor = 1)

    write(replicate(customer, copies, Map("c_custkey" -> cStride)),
      "customer", copies)
    write(replicate(supplier, copies, Map("s_suppkey" -> sStride)),
      "supplier", 1)
    write(replicate(part, copies, Map("p_partkey" -> pStride)), "part", copies)
    write(replicate(orders, copies,
      Map("o_orderkey" -> oStride, "o_custkey" -> cStride)), "orders", copies)
    write(replicate(Tables.lineitem(spark, src), copies,
      Map("l_orderkey" -> oStride, "l_partkey" -> pStride,
        "l_suppkey" -> sStride)), "lineitem", 2 * copies)
    write(replicate(events, copies,
      Map("event_id" -> eStride, "user_id" -> uStride)), "events", copies)
    write(replicate(docs, copies, Map("doc_id" -> dStride),
      (d, i) => d.withColumn("text", saltWords(col("text"), i))
        .withColumn("n_chars", length(col("text")).cast("long"))),
      "documents", copies)
    write(replicate(emb, copies, Map("vec_id" -> vStride),
      (d, i) => d.withColumn("embedding",
        jitterVec(col("embedding"), col("vec_id"), i))),
      "embeddings", copies)

    spark.stop()
  }
}
