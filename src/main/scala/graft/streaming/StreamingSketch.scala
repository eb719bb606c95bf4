package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Profiling

/** Streaming front-end for the mergeable sketches: the same
  * append-log discipline as [[StreamingIncremental]], applied to
  * [[Profiling.countMinCounters]]. Each micro-batch writes ITS OWN
  * counter table (≤ depth·width rows regardless of batch size);
  * reads merge by integer addition — so frequency estimates over
  * everything-that-has-arrived cost a scan of batches·depth·width
  * counter rows, never a rescan of the stream's history, and a
  * compaction is one [[Profiling.mergeCountMin]] over a closed range
  * swapped in place of its inputs.
  *
  * Why not a stateful streaming aggregation: the counter table IS
  * the state, it is config-sized, and addition is associative — an
  * append log gets exactly-once-at-read semantics (a retried batch
  * appends a duplicate file only if the previous attempt's commit is
  * not visible, which the parquet committer guarantees against) with
  * none of the state-store machinery.
  */
object StreamingSketch {

  /** Start the counter sink: each micro-batch's keys fold into one
    * depth×width counter table appended to `path`. */
  def cmsSink(
      stream: DataFrame, key: Column, depth: Int, width: Int,
      path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Profiling.countMinCounters(batch, key, depth, width)
          .write.mode("append").parquet(path)
      }
      .start()

  /** The merged counter table of everything appended so far. */
  def readCounters(spark: SparkSession, path: String): DataFrame =
    Profiling.mergeCountMin(spark.read.parquet(path))

  /** Frequency estimates for `probes` against the whole log. */
  def readEstimates(
      spark: SparkSession, path: String, probes: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame =
    Profiling.countMinEstimate(
      readCounters(spark, path), probes, key, depth, width)

  // ---------------------------------------------------------------
  // Quantile sketch (bounded-error streaming quantiles / KS — the
  // r10 "band-granular only" gap closed): same append-log
  // discipline, applied to [[graft.operators.QuantileSketch]]. Each
  // micro-batch appends ITS OWN bottom-k sketch (≤ k rows per batch
  // regardless of batch size); reads merge by bottom-k — order-free
  // and exactly equal to the single-pass sketch of everything that
  // has arrived (the multiset-pure merge), so a retried batch or an
  // out-of-order backfill cannot change the merged result as long as
  // each row appends once. A compaction is one
  // [[graft.operators.QuantileSketch.merge]] over a closed range
  // swapped in place of its inputs.
  // ---------------------------------------------------------------

  /** Start the quantile-sketch sink: each micro-batch's bottom-k
    * sketch of `value` (keyed by `rowId`) appends to `path`. */
  def quantileSink(
      stream: DataFrame, value: Column, rowId: Column, k: Int,
      path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.QuantileSketch
          .sketchPartials(batch, value, rowId, k)
          .write.mode("append").parquet(path)
      }
      .start()

  /** The merged sketch of everything appended so far. */
  def readQuantileSketch(spark: SparkSession, path: String, k: Int): DataFrame =
    graft.operators.QuantileSketch.merge(k, spark.read.parquet(path))

  /** Bounded-error quantiles over the whole log. */
  def readQuantiles(
      spark: SparkSession, path: String, k: Int,
      probs: Seq[Double]): DataFrame =
    graft.operators.QuantileSketch.quantiles(
      readQuantileSketch(spark, path, k), probs)

  // ---------------------------------------------------------------
  // Source-overlap maintenance (the q141 matrix kept current per
  // ingest batch instead of recomputed — r10 verdict item 8): the
  // same append-log discipline applied to the per-group MinHash
  // sketches. Each micro-batch appends ITS OWN group-sketch table
  // (≤ groups rows per batch); reads merge by elementwise min + doc-
  // count add — associative/commutative, so the merged table equals
  // the single-pass sketch of everything arrived, bit for bit, in
  // any batch order. The overlap matrix then reads groups² sketch
  // rows, never the corpus.
  // ---------------------------------------------------------------

  /** Start the group-sketch sink: each micro-batch's per-group
    * MinHash sketches append to `path`. */
  def groupSketchSink(
      stream: DataFrame, textCol: String, groupCol: String,
      path: String, checkpoint: String,
      n: Int = 5, numHashes: Int = 64): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Dedup
          .groupSketches(batch, textCol, groupCol, n, numHashes)
          .write.mode("append").parquet(path)
      }
      .start()

  /** The merged per-group sketch table of everything appended. */
  def readGroupSketches(
      spark: SparkSession, path: String, numHashes: Int = 64): DataFrame =
    graft.operators.Dedup.mergeGroupSketchLog(
      spark.read.parquet(path), numHashes)

  /** The cross-source overlap matrix over the whole log — the q141
    * surface, maintained. */
  def readOverlapMatrix(
      spark: SparkSession, path: String, numHashes: Int = 64): DataFrame =
    graft.operators.Dedup.overlapMatrixFromSketches(
      readGroupSketches(spark, path, numHashes), numHashes)
}
