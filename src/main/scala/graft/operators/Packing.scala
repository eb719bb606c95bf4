package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training batches: group documents into packs
  * of bounded total size (token/char budget) so downstream training
  * consumes dense, similarly-sized concatenations instead of one
  * ragged document per row — the standard pretraining-input layout.
  *
  * Distributed shape: a GLOBAL greedy packer is a sequential fold
  * (inherently one task), so rows are first sharded by an md5-derived
  * hash (hex digits 9–12 of the same digest [[Sampling.hashScore]]
  * reads digits 1–8 from — portable, so an oracle can replay the
  * sharding) — every shard packs independently and in parallel, and
  * `shards` scales with the cluster, not the data. Within a shard,
  * rows take a deterministic order (md5 hash score, id tiebreak —
  * the same engine-portable order the split/cap operators use) and a
  * running size sum assigns pack boundaries by budget division: a
  * document whose preceding in-shard cumulative sum has consumed p
  * full budgets lands in pack p.
  *
  * The bound this buys: every pack's total is < budget + the size of
  * its own last document (only the straddling document overflows its
  * boundary) — the streaming first-fit guarantee. Oversized single
  * documents (size ≥ budget) land alone in their own pack (callers
  * should truncate/split upstream). Fully expression-based: one
  * window sum per shard, no driver loop, no global sort.
  */
object Packing {

  /** Assign each row a (shard, pack_id) and in-pack position.
    * Returns the input columns plus `shard`, `pack_id`, `pack_pos`
    * (1-based within the pack, in packing order).
    */
  def packBySizeBudget(
      df: DataFrame, idCol: String, sizeCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget >= 1, "budget must be positive")
    require(shards >= 1 && shards <= 0xFFFF, "shards must be in [1, 65535]")
    val W = org.apache.spark.sql.expressions.Window
    // portable shard: md5 hex digits 9-12 (disjoint from hashScore's
    // 1-8, so shard and in-shard order are independent)
    val shard = (conv(substring(
        md5(col(idCol).cast("string").cast("binary")), 9, 4), 16, 10)
      .cast("bigint") % shards)
    val order = Seq(Sampling.hashScore(col(idCol)).asc, col(idCol).asc)
    val wRun = W.partitionBy(shard).orderBy(order: _*)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val withPack = df
      .withColumn("shard", shard)
      .withColumn("_cum", sum(col(sizeCol).cast("long")).over(wRun))
      // pack p = budgets fully consumed BEFORE this doc: the doc that
      // crosses a boundary stays with the pack it started in
      .withColumn("pack_id",
        floor((col("_cum") - col(sizeCol)).cast("double") / lit(budget.toDouble)))
    val wPos = W.partitionBy(col("shard"), col("pack_id")).orderBy(order: _*)
    withPack
      .withColumn("pack_pos", row_number().over(wPos).cast("bigint"))
      .drop("_cum")
  }

  /** Pack-level summary: documents and total size per pack. */
  def packSummary(
      df: DataFrame, idCol: String, sizeCol: String,
      budget: Long, shards: Int): DataFrame =
    packBySizeBudget(df, idCol, sizeCol, budget, shards)
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(sizeCol).cast("long")).as("total_size"),
        min(col(idCol)).as("min_id"))
}
