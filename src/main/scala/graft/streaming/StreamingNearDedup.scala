package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.DqFunctions.{charShingles, minhashBaseHashes}
import graft.functions.MinhashExpression

/** Streaming MinHash-LSH near-duplicate detection — the streaming
  * counterpart of the batch `Dedup.lshNearDupPairs` path, at the
  * CANDIDATE level: a document COLLIDES when one of its signature
  * band buckets was already claimed by an earlier document inside the
  * TTL horizon.
  *
  * Same S-curve as batch LSH: with b bands of r rows, a true near-dup
  * of Jaccard s collides in some band w.p. 1 − (1 − s^r)^b (→ 1 as
  * s → 1, the dedup regime). Unlike the batch path there is no
  * signature-agreement verify against the specific prior doc — state
  * per bucket is one boolean, not a signature list, which is what
  * keeps state O(buckets in horizon) instead of O(docs × bands).
  * Shingle length n is the primary false-positive knob (see SCALE.md
  * on ambient similarity: n=5 collapses ambient trigram collisions).
  *
  * Emitted rows are the per-band collisions (doc_id, ts, band);
  * `collisions.select("doc_id").distinct()` (or a downstream
  * dedup/anti-join at compaction) turns them into drop decisions.
  * Keyed state: one TTL'd boolean per (band, bucket) combined 64-bit
  * key — first arrival claims the bucket silently, later arrivals
  * within the TTL emit.
  */
object StreamingNearDedup {

  /** First-claim-wins bucket membership: emits one row per input row
    * whose (band, bucket) key was already claimed; first arrivals
    * claim silently. Within one micro-batch the grouped iterator
    * order decides the claimer — same first-arrival semantics as the
    * exact streaming dedup.
    */
  class BucketClaimProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, java.sql.Timestamp, Int), (Long, java.sql.Timestamp, Int)] {
    import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}
    @transient private var claimed: ValueState[Boolean] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      claimed = getHandle.getValueState[Boolean](
        "claimed", Encoders.scalaBoolean, TTLConfig(ttl))

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long, java.sql.Timestamp, Int)],
        timerValues: TimerValues): Iterator[(Long, java.sql.Timestamp, Int)] = {
      val out = Iterator.newBuilder[(Long, java.sql.Timestamp, Int)]
      var seen = claimed.exists()
      rows.foreach { case (_, docId, ts, band) =>
        if (seen) out += ((docId, ts, band))
        else { claimed.update(true); seen = true }
      }
      out.result().iterator
    }
  }

  /** Per-band collision stream over streaming documents: output
    * columns (doc_id, ts, band) — one row per band of an incoming
    * document that hit an already-claimed bucket within `ttl`.
    */
  def bandCollisions(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String, textCol: String, tsCol: String,
      n: Int = 5, numHashes: Int = 64, bands: Int = 16,
      ttl: java.time.Duration = java.time.Duration.ofHours(24)): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    require(numHashes % bands == 0, "bands must divide numHashes")
    // same guard as Dedup.duplicateClusters: a silent long cast of a
    // string/UUID id nulls every doc_id and the collision stream
    // degenerates to null rows with no error
    val idType = docs.schema(idCol).dataType
    require(idType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }, s"bandCollisions requires an integral id column; '$idCol' is " +
      s"${idType.simpleString} — map ids to a long surrogate upstream")
    val rows = numHashes / bands
    // staged projections, exactly like the batch signature pipeline
    // (inlining would duplicate the shingle/hash subtree per band)
    val sigs = docs
      .select(col(idCol).cast("long").as("_id"), col(tsCol).as("_ts"),
        charShingles(col(textCol), n).as("_sh"))
      .select(col("_id"), col("_ts"), minhashBaseHashes(col("_sh")).as("_mh"))
      .select(col("_id"), col("_ts"),
        MinhashExpression.minhashFromBaseNative(col("_mh"), numHashes).as("_sig"))
    val banded = sigs.select(col("_id"), col("_ts"),
      explode(array((0 until bands).map { b =>
        // combined (band, bucket) 64-bit key: band index salts the
        // slice hash so bucket spaces of different bands don't alias
        struct(lit(b).as("band"),
          xxhash64(lit(b), slice(col("_sig"), b * rows + 1, rows)).as("key"))
      }: _*)).as("bb"))
      .select(col("bb.key").as("_key"), col("_id"), col("_ts"), col("bb.band").as("_band"))
    banded.as[(Long, Long, java.sql.Timestamp, Int)]
      .groupByKey(_._1)
      .transformWithState(new BucketClaimProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
      .toDF("doc_id", "ts", "band")
  }
}
