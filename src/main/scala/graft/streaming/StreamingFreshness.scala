package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming extension of the freshness/count checks (SURVEY.md
  * §2.10, §7.2 M5): the same per-table count + max-event-time
  * semantics as the batch DCC pipeline, expressed over an unbounded
  * `events` stream with watermarked tumbling windows.
  *
  * Batch parity note: the transformation is a pure DataFrame →
  * DataFrame function, so the identical code runs in batch mode for
  * testing (Structured Streaming's unified API) — the spec drives it
  * both ways.
  */
object StreamingFreshness {

  /** Tumbling-window freshness per event_type: count + max event time
    * per (window, type). With a watermark, state for closed windows
    * is dropped — bounded state at any input scale.
    */
  def windowedFreshness(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("record_count"),
        max(col("ts")).as("max_ts"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("record_count"), col("max_ts"))

  /** Streaming reconciliation precursor: per-site running counts
    * (PPE's census as a continuously-maintained aggregate).
    */
  def runningSiteCounts(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day"),
        pmod(col("user_id"), lit(25)).cast("int").as("site_id"))
      .agg(count(lit(1)).as("record_count"))
      .select(col("window.start").as("window_start"), col("site_id"), col("record_count"))
}
