package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-at-rest clustering for scan pruning — the write-side half of
  * the skipping story whose read side is [[Provenance.fileManifest]].
  *
  * A table range-partitioned and sorted on ONE key prunes perfectly
  * on that key and not at all on any other. Z-ordering (Morton-code
  * interleaving) spreads locality across TWO keys: sorting by the
  * interleaved value makes each file's [min,max] envelope tight on
  * BOTH dimensions, so point/range predicates on either column (or
  * both) skip most files. This is the multi-dimensional clustering
  * lakehouse table formats ship (cf. the public Delta/Iceberg
  * Z-order feature); here it is pure column arithmetic + a
  * range-partitioned sorted write — no format extension needed.
  *
  * The Morton code is computed with the standard mask-shift bit
  * spread — five shift/mask rounds per coordinate, plain integer
  * ops, codegen'd, and stated identically in any engine with `&`,
  * `|`, `<<` (the DuckDB oracle mirrors it literally).
  */
object Layout {

  /** Shift/mask pairs that spread the low 32 bits of a long into the
    * even bit positions (Morton bit-interleave building block).
    */
  private val SpreadRounds: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** SQL text of the same spread, for oracle generation — keeps the
    * engine and the oracle derived from ONE constant table.
    */
  private[graft] def spreadSql(expr: String): String =
    SpreadRounds.foldLeft(s"CAST($expr AS BIGINT)") { case (e, (sh, m)) =>
      s"((($e) | (($e) << $sh)) & $m)"
    }

  /** The low 32 bits of `c` spread into even bit positions:
    * bit i of `c` lands at bit 2i. Input must be in [0, 2³¹) — the
    * result then stays positive (≤ 2⁶²) and order-meaningful.
    */
  def spreadBits(c: Column): Column =
    SpreadRounds.foldLeft(c.cast("long")) { case (v, (sh, m)) =>
      (v.bitwiseOR(shiftleft(v, sh))).bitwiseAND(lit(m))
    }

  /** Morton/Z-order interleave of two coordinates: x's bits on even
    * positions, y's on odd. Sorting by this value produces the
    * Z-shaped space-filling curve — runs of consecutive values stay
    * local in BOTH x and y. Coordinates must be non-negative and
    * < 2³¹ (map real keys down with a hash, bucket index, or offset
    * first); violations raise rather than silently interleave sign
    * bits.
    */
  def zorder2(x: Column, y: Column): Column = {
    val checked = (c: Column) =>
      when(c.isNull || c < 0 || c >= lit(2147483648L),
        raise_error(concat(lit("zorder2 coordinate out of [0, 2^31): "), c.cast("string"))))
        .otherwise(c)
    spreadBits(checked(x)).bitwiseOR(shiftleft(spreadBits(checked(y)), 1))
  }

  /** Write `df` clustered by `clusterCol` into ~`numFiles` files:
    * range-partition on the cluster value (contiguous value ranges →
    * disjoint file envelopes), sort within each partition (tight
    * per-rowgroup stats for readers that use them), write parquet.
    * With `clusterCol = zorder2(a, b)` this is a Z-ordered layout;
    * with a plain column it is linear clustering. Range partitioning
    * samples the cluster value to place boundaries, so skew in the
    * cluster key spreads evenly across files.
    */
  def writeClustered(
      df: DataFrame, path: String, clusterCol: Column, numFiles: Int): Unit = {
    require(numFiles >= 1, "numFiles must be positive")
    require(!df.columns.contains("__cluster"),
      "__cluster is reserved by writeClustered")
    df.withColumn("__cluster", clusterCol)
      .repartitionByRange(numFiles, col("__cluster"))
      .sortWithinPartitions(col("__cluster"))
      .drop("__cluster")
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` hash-bucketed (and per-bucket sorted) on `bucketCol`
    * as a catalog table at `path` — the at-rest layout that makes
    * every FUTURE equi-join or aggregation on that key shuffle-free:
    * two tables bucketed on the same key with the same bucket count
    * sort-merge-join with NO Exchange on either side (the file
    * layout IS the hash partitioning, so Spark reuses it instead of
    * re-shuffling 100 TB per query). The amortization argument of
    * [[writeClustered]] applied to joins instead of scans: pay one
    * shuffle at write time, never again.
    *
    * Catalog, not bare parquet, by necessity: bucket metadata lives
    * in the table definition, so a path read cannot prove the layout
    * and would re-shuffle. `numBuckets` is the at-rest parallelism —
    * size it so one bucket of the LARGER fact table fits an executor
    * (too few buckets caps join parallelism; a 100 TB fact wants
    * thousands). Joining tables with MISMATCHED bucket counts
    * shuffles the smaller side only when one count divides the other
    * (Spark's bucket coalescing); keep counts aligned across a
    * subject area.
    */
  def writeBucketed(
      df: DataFrame, table: String, path: String, bucketCol: String,
      numBuckets: Int): Unit = {
    require(numBuckets >= 1, "numBuckets must be positive")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }
}
