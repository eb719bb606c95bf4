package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-log compaction: reduce an append-only change stream to the
  * current snapshot — latest row per key wins, tombstoned keys drop.
  * The batch half of CDC ingestion (the streaming half is
  * [[graft.streaming.StreamingFreshness.dedupStreamTtl]]'s keyed
  * state shape).
  *
  * One shuffle on the key; the per-key ordering resolves inside the
  * window sort. At warehouse scale this runs per partition of a
  * key-partitioned log so the shuffle is partition-local, and the
  * ordering column set MUST be total (version, then a unique
  * tiebreaker) — a tie at the top would make "current" nondeterministic.
  */
object Snapshot {

  /** Latest row per `keyCols` under `ordering` (pass DESC columns:
    * highest version first). Rows whose latest version satisfies
    * `tombstone` are removed entirely — a delete marker erases the
    * key from the snapshot, it doesn't resurrect the previous row.
    */
  def latestSnapshot(
      df: DataFrame, keyCols: Seq[String], ordering: Seq[Column],
      tombstone: Option[Column] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(ordering: _*)
    val latest = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    // null tombstone predicate means NOT a delete: a bare !t would
    // drop NULL-evaluating rows (filter keeps only TRUE), erasing
    // keys whose discriminator column is simply null
    tombstone.fold(latest)(t => latest.filter(!coalesce(t, lit(false))))
  }
}
