package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

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

  /** One event-type's running freshness state, maintained across
    * micro-batches by [[freshnessMonitor]].
    */
  final case class FreshnessState(maxTsMicros: Long, totalCount: Long)

  /** Continuously-updated freshness snapshot per key. */
  final case class FreshnessStatus(
      event_type: String,
      max_ts_micros: Long,
      total_count: Long)

  /** Stateful freshness monitor (`mapGroupsWithState`): tracks, per
    * event_type, the running max event time and total count across
    * ALL micro-batches — the DCC freshness check as a continuously-
    * maintained quantity rather than a batch snapshot. State is one
    * tiny record per key (bounded by key cardinality, not input
    * volume); a production deployment adds a timeout to expire keys
    * that stop arriving.
    */
  def freshnessMonitor(
      spark: SparkSession,
      events: DataFrame): Dataset[FreshnessStatus] = {
    import spark.implicits._
    events
      .select(col("event_type"), unix_micros(col("ts")).as("ts_micros"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[FreshnessState, FreshnessStatus] {
        (key: String, batch: Iterator[(String, Long)], state: GroupState[FreshnessState]) =>
          val prev = state.getOption.getOrElse(FreshnessState(Long.MinValue, 0L))
          var maxTs = prev.maxTsMicros
          var n = prev.totalCount
          batch.foreach { case (_, ts) =>
            if (ts > maxTs) maxTs = ts
            n += 1
          }
          val next = FreshnessState(maxTs, n)
          state.update(next)
          FreshnessStatus(key, next.maxTsMicros, next.totalCount)
      }(Encoders.product[FreshnessState], Encoders.product[FreshnessStatus])
  }

  /** Streaming exact dedup: drop events whose dedup key was already
    * seen within the watermark horizon. State holds one entry per
    * distinct key inside the horizon and is purged as the watermark
    * advances — the streaming half of the training-data dedup story
    * (batch half: Dedup.dropExactDuplicates).
    */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Gap-based streaming sessionization via the built-in
    * `session_window`: the streaming counterpart of
    * `Temporal.sessionize`. A session's state is emitted and dropped
    * once the watermark passes its close (start-gap merge handled by
    * the engine); state is bounded by open sessions, not input volume.
    */
  def sessionizedCounts(
      events: DataFrame,
      keyCol: String = "user_id",
      gap: String = "30 minutes",
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("n_events"))

  final case class VolumeState(count: Long, alerted: Boolean)
  final case class VolumeAlert(event_type: String, total_count: Long)

  /** Threshold-crossing alert stream (`flatMapGroupsWithState`):
    * emits ONE alert per event_type the first time its running count
    * reaches `threshold`, and nothing afterwards — 0-or-1 outputs per
    * group per batch, the variable-arity contract that
    * `mapGroupsWithState` (exactly one output) cannot express.
    */
  def volumeAlerts(
      spark: SparkSession,
      events: DataFrame,
      threshold: Long): Dataset[VolumeAlert] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    events.select(col("event_type")).as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState[VolumeState, VolumeAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[String], state: GroupState[VolumeState]) =>
          val prev = state.getOption.getOrElse(VolumeState(0L, alerted = false))
          val total = prev.count + batch.size
          if (!prev.alerted && total >= threshold) {
            state.update(VolumeState(total, alerted = true))
            Iterator.single(VolumeAlert(key, total))
          } else {
            state.update(VolumeState(total, prev.alerted))
            Iterator.empty
          }
      }
  }

  /** First-seen filter over keys with native state TTL — the Spark 4
    * `transformWithState` API (StatefulProcessor + ValueState +
    * TTLConfig): emits a key's FIRST occurrence, suppresses repeats
    * until the state's TTL expires, after which the key may be
    * emitted again. State expiry is handled by the store itself (no
    * watermark coupling) — the production shape for "dedup within a
    * retention horizon" when the horizon is wall-clock, not
    * event-time. Requires the RocksDB state store provider.
    */
  class FirstSeenProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Long, Long] {
    import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}
    @transient private var seen: ValueState[Boolean] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      seen = getHandle.getValueState[Boolean](
        "seen", Encoders.scalaBoolean, TTLConfig(ttl))

    override def handleInputRows(
        key: Long, rows: Iterator[Long], timerValues: TimerValues): Iterator[Long] =
      if (seen.exists()) Iterator.empty
      else { seen.update(true); Iterator.single(key) }
  }

  /** Streaming TTL dedup via [[FirstSeenProcessor]]. */
  def dedupStreamTtl(
      spark: SparkSession,
      events: DataFrame,
      keyCol: String,
      ttl: java.time.Duration): Dataset[Long] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    events.select(col(keyCol).cast("long")).as[Long]
      .groupByKey(identity)
      .transformWithState(new FirstSeenProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Watermarked stream-stream interval join: attribute each `click`
    * to the `view`s by the same user within the preceding
    * `attributionWindow`. Both sides carry watermarks and the join
    * condition bounds click_ts ∈ [view_ts, view_ts + window], so the
    * engine can prove when buffered view state is unmatchable and
    * drop it — the contract that makes stream-stream joins run with
    * bounded state at any input rate.
    */
  def attributedClicks(
      events: DataFrame,
      attributionWindow: String = "30 minutes",
      watermarkDelay: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermarkDelay)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    clicks.join(views,
      expr(s"""c_user = v_user
              |AND click_ts >= view_ts
              |AND click_ts <= view_ts + INTERVAL $attributionWindow""".stripMargin))
      .select(col("c_user").as("user_id"), col("view_ts"), col("click_ts"))
  }

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
