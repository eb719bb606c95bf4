package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver Parquet corpus (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`; schemas in FIXTURES.md §B.
  * All reads go through here so that scan options (and, at cluster
  * scale, bucketing / partition layout) are controlled in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame   = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame   = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame     = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame   = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  private val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"
  // path -> whether that events.parquet carries the nanos-as-long layout;
  // populated on first probe so repeat loads never re-bracket the conf.
  // Assumes a file at a given path keeps its layout for the session.
  private val nanosLayout =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private val probeLock = new Object

  /** Load `events.parquet` with the legacy `nanosAsLong` conf set ONLY
    * if the file actually carries the TIMESTAMP(NANOS) layout.
    *
    * The probe: set the conf, read the footer schema (eager at
    * `spark.read.parquet`), inspect `ts`. If the layout is NOT
    * nanos-as-long, restore the previous conf value immediately — a
    * micros/native-timestamp corpus leaves the session untouched, so
    * other nanos-timestamp parquets in the same session keep their
    * normal (fail-loudly) decoding. If the layout IS nanos, the conf
    * must stay set: Spark re-reads it at EXECUTION time (the physical
    * reader re-resolves the session conf when an action runs, long
    * after any save/restore bracket would have closed), so scoping it
    * tighter would break the lazy DataFrame. That residual
    * session-wide effect exists only for nanos corpora and is the
    * documented cost of Spark offering no per-read switch.
    *
    * Concurrency: the set-probe-restore bracket is serialized on
    * `probeLock` and runs at most ONCE per path — the detected layout
    * is cached, so steady-state loads never touch the conf (nanos
    * paths just re-assert `true`, idempotently). The bracket still
    * cannot shield parquet loads issued OUTSIDE this object during the
    * first probe's brief window: a concurrent `spark.read.parquet`
    * elsewhere in the session could observe the temporarily-set conf.
    * Callers mixing other nanos-timestamp parquets into the same
    * session should issue the first `events` load before going
    * multi-threaded.
    */
  private def loadEventsRaw(spark: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    val known = nanosLayout.get(path)
    if (known != null) {
      // nanos layouts need the conf live at execution time; re-assert
      // (idempotent) in case another probe's restore raced this plan
      if (known) spark.conf.set(NanosAsLongKey, "true")
      return load(spark, d, "events")
    }
    probeLock.synchronized {
      val again = nanosLayout.get(path)
      if (again != null) {
        if (again) spark.conf.set(NanosAsLongKey, "true")
        return load(spark, d, "events")
      }
      val saved = spark.conf.getOption(NanosAsLongKey)
      spark.conf.set(NanosAsLongKey, "true")
      val raw = load(spark, d, "events")
      val isNanos =
        raw.schema("ts").dataType == org.apache.spark.sql.types.LongType
      nanosLayout.put(path, isNanos)
      if (!isNanos) {
        saved match {
          case Some(v) => spark.conf.set(NanosAsLongKey, v)
          case None    => spark.conf.unset(NanosAsLongKey)
        }
      }
      raw
    }
  }

  /** `events.ts` has shipped in two parquet layouts across corpus
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read nanos as long via the legacy conf and convert with
    * integer arithmetic, since nanos since epoch exceed 2^53) and plain
    * TIMESTAMP(MICROS) (readable directly). Detect per read and handle
    * both; DuckDB truncates NANOS→micros the same way, so oracle values
    * agree in either layout. Conf scoping: see [[loadEventsRaw]].
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = loadEventsRaw(spark, d)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Naive micros layout. Downstream operators use `unix_micros`,
        // which requires TIMESTAMP(LTZ); under the UTC session timezone
        // the cast is numerically exact and reproduces the nanos-layout
        // output type bit-for-bit.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** `events` with `ts < cutoff` applied on the RAW stored column so
    * the predicate pushes into the parquet scan (filtering a converted
    * timestamp cannot push). For the nanos-as-long layout,
    * `ts div 1000 < cutoffMicros` ⟺ `ts < cutoffMicros·1000` for
    * non-negative nanos, so results are identical to filtering after
    * conversion — but row groups outside the range never leave disk,
    * which at 100 TB is the difference between a pruned scan and a
    * full one. For the native-timestamp layout the filter pushes as-is.
    */
  def eventsBefore(spark: SparkSession, d: String, cutoff: String): DataFrame = {
    val raw = loadEventsRaw(spark, d)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        val cutoffNanos = java.time.LocalDateTime
          .parse(cutoff.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC)
          .toEpochMilli * 1000000L
        raw
          .filter(org.apache.spark.sql.functions.col("ts") < cutoffNanos)
          .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Filter on the stored NTZ column (pushes into the scan), then
        // normalize to TIMESTAMP(LTZ) as `events` does.
        raw
          .filter(org.apache.spark.sql.functions.col("ts") <
            org.apache.spark.sql.functions.lit(cutoff).cast(org.apache.spark.sql.types.TimestampNTZType))
          .withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ =>
        raw.filter(org.apache.spark.sql.functions.col("ts") <
          org.apache.spark.sql.functions.lit(cutoff).cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame  = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
