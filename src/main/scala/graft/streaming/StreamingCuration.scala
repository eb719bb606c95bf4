package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.Curation
import graft.Curation.CurationConfig

/** The curation funnel's streaming front-end: the stages that are
  * per-row or keyed-state — quality gate, language gate, exact dedup
  * within a TTL horizon — run continuously on the document stream,
  * so only pre-filtered, pre-deduplicated documents land for the
  * batch stages (near-dedup, decontamination, split) that genuinely
  * need corpus-wide context.
  *
  * Gates reuse the EXACT batch predicates
  * ([[Curation.qualityPredicate]]/[[Curation.languagePredicate]]), so
  * the ADMISSION decision is identical between ingest-time and
  * compact-time filtering. Dedup keys on the same md5 content hash as
  * the batch path ([[graft.operators.Dedup.exactDuplicateGroups]]) —
  * a 64-bit hash would collide with ~50% odds by ~5×10⁹ documents,
  * dropping a distinct document forever. The REPRESENTATIVE differs
  * by necessity: a stream keeps the first arrival per content (it
  * cannot wait for a smaller id that may never come), where the batch
  * path keeps the min id; content-wise the surviving set is the same.
  * Dedup state carries store-native TTL (RocksDB), bounding state by
  * the horizon, not the stream length.
  */
object StreamingCuration {

  /** Emits the first row per content hash; repeats are suppressed
    * until the state's TTL expires. Keyed by the 64-bit content hash;
    * the row (id, text) rides as the value.
    */
  class FirstDocPerContentProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, String), (Long, String)] {
    import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}
    @transient private var seen: ValueState[Boolean] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      seen = getHandle.getValueState[Boolean](
        "seen", Encoders.scalaBoolean, TTLConfig(ttl))

    override def handleInputRows(
        key: String, rows: Iterator[(String, Long, String)],
        timerValues: TimerValues): Iterator[(Long, String)] =
      if (seen.exists() || rows.isEmpty) Iterator.empty
      else {
        seen.update(true)
        val first = rows.next() // first arrival wins within the batch too
        Iterator.single((first._2, first._3))
      }
  }

  /** Quality gate → language gate → TTL exact-dedup over a streaming
    * documents source. Output columns: (idCol, textCol), first
    * occurrence per distinct text within the TTL horizon.
    */
  def gatedDedupedStream(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: CurationConfig = CurationConfig(),
      dedupTtl: java.time.Duration = java.time.Duration.ofHours(24)): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    val t = col(textCol)
    docs
      .filter(Curation.qualityPredicate(t, cfg) && Curation.languagePredicate(t, cfg))
      // md5, NOT xxhash64: same content key as the batch exact dedup,
      // and a 128-bit space so corpus-scale streams can't collide
      .select(md5(t.cast("binary")).as("_h"),
        col(idCol).cast("long").as("_id"), t.as("_text"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new FirstDocPerContentProcessor(dedupTtl),
        TimeMode.ProcessingTime(), OutputMode.Append())
      .toDF(idCol, textCol)
  }
}
