package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The actual codec step is STUBBED (this container ships no
  * image/audio libraries): `decodeStub` derives deterministic fake
  * dimensions from the payload hash. Everything around it — the
  * schema, the typed Dataset plumbing, the batched `mapPartitions`
  * shape (decode libraries amortize per-batch setup), and the
  * repartition-for-parallel-decode step — is real and tested, so a
  * real decoder drops in by replacing one function.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String)

  /** Decoded features (width/height for images, duration for a/v). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sha256: String,
      width: Int,
      height: Int,
      duration_ms: Long)

  /** Build a media table from any table with an id + string payload
    * column — the corpus has no true binary media, so documents.text
    * stands in as payload bytes (UTF-8). Kind assignment is a
    * deterministic id-based rotation.
    */
  def mediaTable(df: DataFrame, idCol: String, payloadCol: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("bigint").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(payloadCol), "UTF-8").as("payload"),
      col(sourceCol).as("source"))

  /** ======= THE STUB =======
    * Deterministic fake decode: dimensions and duration derived from
    * payload length/hash. A real pipeline replaces this body with the
    * actual codec call (e.g. javax.imageio / ffmpeg binding); the
    * signature — one batch of payloads in, features out — is the
    * contract that keeps per-batch codec setup amortized.
    */
  def decodeStub(batch: Seq[MediaItem]): Seq[MediaFeatures] =
    batch.map { m =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(m.payload).map("%02x".format(_)).mkString
      val h = java.util.Arrays.hashCode(m.payload)
      MediaFeatures(
        media_id = m.media_id,
        kind = m.kind,
        n_bytes = m.payload.length.toLong,
        sha256 = sha,
        width = 64 + math.floorMod(h, 1024),
        height = 64 + math.floorMod(h >> 10, 1024),
        duration_ms = if (m.kind == "image") 0L else 1000L + math.floorMod(h, 60000).toLong)
    }

  /** Distributed decode: repartition for parallel codec work, then
    * batched mapPartitions through the stub. `batchSize` bounds
    * per-batch memory (payloads can be MBs each at 100 TB scale —
    * never collect a partition into one batch).
    */
  def decodeFeatures(
      spark: SparkSession, media: DataFrame,
      partitions: Int, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaItem]
      .repartition(partitions, col("media_id"))
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeStub(g.toSeq)))
  }

  /** Frame sampling for video rows: explode n evenly-spaced fake
    * frame indices per video (the Spark-side shape of ffmpeg frame
    * extraction — one row out per sampled frame).
    */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), lit(nFrames - 1))))
      .select(col("media_id"), col("frame_idx"),
        xxhash64(col("payload"), col("frame_idx")).as("frame_fingerprint"))
}
