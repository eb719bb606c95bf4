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
}
