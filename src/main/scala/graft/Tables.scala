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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read nanos as long (legacy conf) and convert to a
    * microsecond timestamp with integer arithmetic (no double round-trip
    * — nanos since epoch exceed 2^53). DuckDB truncates NANOS→micros the
    * same way, so oracle values agree.
    *
    * Side effect: `nanosAsLong` is a session-level conf (Spark offers no
    * per-read switch), so after the first events read, any OTHER
    * nanos-timestamp parquet in the session also decodes as long. The
    * corpus has exactly one such table; a multi-tenant session would
    * need the conf scoped at its boundary instead.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** `events` with `ts < cutoff` applied on the RAW nanos column so
    * the predicate pushes into the parquet scan (filtering the
    * converted timestamp cannot push). `ts div 1000 < cutoffMicros`
    * ⟺ `ts < cutoffMicros·1000` for non-negative nanos, so results
    * are identical to filtering after conversion — but row groups
    * outside the range never leave disk, which at 100 TB is the
    * difference between a pruned scan and a full one.
    */
  def eventsBefore(spark: SparkSession, d: String, cutoff: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val cutoffNanos = java.time.LocalDateTime
      .parse(cutoff.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
      .toEpochMilli * 1000000L
    load(spark, d, "events")
      .filter(org.apache.spark.sql.functions.col("ts") < cutoffNanos)
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, d: String): DataFrame  = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
