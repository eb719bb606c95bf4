package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Incremental

class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val events = Seq(
    ("a", ts("2024-01-01 05:00:00"), 10L),
    ("a", ts("2024-01-01 06:00:00"), 5L),
    ("a", ts("2024-01-02 05:00:00"), 1L),
    ("b", ts("2024-01-01 12:00:00"), 100L),
    ("b", ts("2024-01-03 12:00:00"), 7L))
    .toDF("k", "t", "w")

  private def totalsMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("merged disjoint partials equal the single-pass aggregate, in any merge order") {
    val direct = totalsMap(Incremental.keyTotals(
      Incremental.bucketPartials(events, $"k", $"t", $"w", 86400L)))
    assert(direct == Map("a" -> (3L, 16L), "b" -> (2L, 107L)))
    // split by day parity, merge in both orders
    val day = dayofmonth($"t")
    val p1 = Incremental.bucketPartials(events.filter(day % 2 === 1), $"k", $"t", $"w", 86400L)
    val p2 = Incremental.bucketPartials(events.filter(day % 2 === 0), $"k", $"t", $"w", 86400L)
    assert(totalsMap(Incremental.keyTotals(Incremental.mergePartials(p1, p2))) == direct)
    assert(totalsMap(Incremental.keyTotals(Incremental.mergePartials(p2, p1))) == direct)
  }

  test("late data for an existing bucket merges additively, not by replacement") {
    val p = Incremental.bucketPartials(events, $"k", $"t", $"w", 86400L)
    val late = Incremental.bucketPartials(
      Seq(("a", ts("2024-01-01 23:00:00"), 4L)).toDF("k", "t", "w"),
      $"k", $"t", $"w", 86400L)
    val merged = Incremental.mergePartials(p, late)
    val day1a = merged.filter($"key" === "a")
      .orderBy($"bucket_start_us").collect().head
    assert((day1a.getLong(2), day1a.getLong(3)) == (3L, 19L))
    // other buckets untouched
    assert(totalsMap(Incremental.keyTotals(merged))("b") == (2L, 107L))
  }

  test("streaming partials sink: merge-at-read totals equal the batch aggregate, late data folds in") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingIncremental
    implicit val sqlCtx = spark.sqlContext
    val scratch = java.nio.file.Files.createTempDirectory("graft_stream_inc").toString
    val (log, ckpt) = (s"$scratch/partials", s"$scratch/ckpt")

    val stream = MemoryStream[(String, java.sql.Timestamp, Long)]
    val sq = StreamingIncremental.partialsSink(
      stream.toDF().toDF("k", "t", "w"),
      $"k", $"t", $"w", 86400L, log, ckpt)
    stream.addData(Seq(
      ("a", ts("2024-01-01 05:00:00"), 10L),
      ("a", ts("2024-01-01 06:00:00"), 5L),
      ("b", ts("2024-01-01 12:00:00"), 100L)))
    sq.processAllAvailable()
    stream.addData(Seq(
      ("a", ts("2024-01-02 05:00:00"), 1L),
      ("b", ts("2024-01-03 12:00:00"), 7L),
      ("a", ts("2024-01-01 23:00:00"), 4L))) // late row for day 1
    sq.processAllAvailable()
    sq.stop()

    // totals equal the single-pass batch aggregate over all arrivals
    val totals = totalsMap(StreamingIncremental.readTotals(spark, log))
    assert(totals == Map("a" -> (4L, 20L), "b" -> (2L, 107L)))
    // the late arrival merged additively into the EXISTING day-1 bucket
    val series = StreamingIncremental.readSeries(spark, log)
      .filter($"key" === "a").orderBy($"bucket_start_us").collect()
    assert(series.length == 2, "late data must not mint a new bucket")
    assert((series.head.getLong(2), series.head.getLong(3)) == (3L, 19L))
    // the log holds per-batch partials (append-only), more rows than buckets
    assert(spark.read.parquet(log).count() == 5L) // 2 + 3 per-batch bucket rows

    // compaction: one row per (key, bucket), totals identical, verified
    val compacted = s"$scratch/compacted"
    val cut = StreamingIncremental.compactLog(spark, log, compacted)
    assert(spark.read.parquet(compacted).count() == 4L) // a:2 buckets, b:2
    assert(totalsMap(Incremental.keyTotals(spark.read.parquet(compacted))) == totals)

    // the cut is the exact file set compacted: a file appended AFTER
    // the cut (a sink still running) is outside it, and the caller's
    // swap discipline (compacted table + post-cut tail) reproduces
    // the full log's totals
    Incremental.bucketPartials(
      Seq(("c", ts("2024-01-05 01:00:00"), 9L)).toDF("k", "t", "w"),
      $"k", $"t", $"w", 86400L)
      .write.mode("append").parquet(log)
    val allFiles = new java.io.File(log).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.toURI.toString)
    val tail = allFiles.filterNot(f => cut.exists(c =>
      new org.apache.hadoop.fs.Path(c).getName == new org.apache.hadoop.fs.Path(f).getName))
    assert(tail.length == 1, "exactly the post-cut append is outside the cut")
    val swapped = Incremental.keyTotals(Incremental.mergePartials(
      spark.read.parquet(compacted).unionByName(spark.read.parquet(tail: _*))))
    assert(totalsMap(swapped) == totals + ("c" -> (1L, 9L)))

    // a lossy rewrite is refused loudly by the PRODUCTION gate
    val before = Incremental.keyTotals(spark.read.parquet(compacted))
    val lossy = before.filter($"key" =!= "b")
    val e = intercept[IllegalArgumentException] {
      StreamingIncremental.verifyLossless(before, lossy, compacted)
    }
    assert(e.getMessage.contains("diverge"))
  }

  test("streaming CUSUM: scoring the partials log equals the batch change point over raw events, late data folded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingIncremental
    implicit val sqlCtx = spark.sqlContext
    val scratch = java.nio.file.Files.createTempDirectory("graft_stream_cusum").toString
    val (log, ckpt) = (s"$scratch/partials", s"$scratch/ckpt")
    // level shift: days 1-3 at 4 rows, days 4-6 at 8 rows; one late row
    def day(d: Int, n: Int) =
      (1 to n).map(i => ("s", ts(f"2024-02-0$d%d ${8 + i % 12}%02d:0${i % 6}:00"), 1L))
    val batch1 = day(1, 4) ++ day(2, 4) ++ day(3, 3) ++ day(4, 8)
    val batch2 = day(5, 8) ++ day(6, 8) :+ (("s", ts("2024-02-03 22:00:00"), 1L)) // late day-3 row
    val stream = MemoryStream[(String, java.sql.Timestamp, Long)]
    val sq = StreamingIncremental.partialsSink(
      stream.toDF().toDF("k", "t", "w"), $"k", $"t", $"w", 86400L, log, ckpt)
    stream.addData(batch1); sq.processAllAvailable()
    stream.addData(batch2); sq.processAllAvailable()
    sq.stop()
    // the standing query maintained the bucket series; CUSUM is a
    // batch query over it (the windowedBandCensus/scoreBandKs split)
    val streamed = graft.operators.StatTests.cusumOverSeries(
        StreamingIncremental.readSeries(spark, log),
        col("bucket_start_us"), col("n"))
      .collect().map(r => r.getAs[Long]("bucket_start_us") -> r).toMap
    val allRows = (batch1 ++ batch2).map(_._2).map(Tuple1(_)).toDF("t")
    val batch = graft.operators.StatTests.cusumChangePoint(allRows, $"t", 86400L)
      .collect().map(r => r.getAs[Long]("bucket_start_us") -> r).toMap
    assert(streamed.keySet == batch.keySet && streamed.size == 6)
    for ((b, s) <- streamed) {
      assert(s.getAs[Long]("mass") == batch(b).getAs[Long]("n"),
        "late data must fold into its bucket before scoring")
      assert(s.getAs[Double]("cusum_scaled") == batch(b).getAs[Double]("cusum_scaled"))
      assert(s.getAs[Boolean]("is_peak") == batch(b).getAs[Boolean]("is_peak"))
    }
    // the peak marks the boundary before the shift (end of day 3)
    val peak = streamed.values.filter(_.getAs[Boolean]("is_peak")).toSeq
    assert(peak.length == 1)
    assert(peak.head.getAs[Long]("bucket_start_us") == streamed.keys.toSeq.sorted.apply(2))
  }

  test("streaming Benford: digit-keyed partials log scores identically to one batch pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingIncremental
    import graft.operators.Checks
    implicit val sqlCtx = spark.sqlContext
    val scratch = java.nio.file.Files.createTempDirectory("graft_stream_benford").toString
    val (log, ckpt) = (s"$scratch/digits", s"$scratch/ckpt")

    // amounts spread over two "ingest batches"; includes non-positive
    // and fractional-cents rows the digit extraction must fence
    val batch1 = Seq(123.45, 190.0, 250.10, 0.0, -7.0).map(v => (ts("2024-01-01 05:00:00"), v))
    val batch2 = Seq(310.99, 1999.0, 12.34, 84.50).map(v => (ts("2024-01-02 05:00:00"), v))
    val stream = MemoryStream[(java.sql.Timestamp, Double)]
    val digitKey = Checks.benfordFirstDigit(bround($"v" * 100.0))
    val sq = StreamingIncremental.partialsSink(
      stream.toDF().toDF("t", "v"), digitKey, $"t", lit(1L), 86400L, log, ckpt)
    stream.addData(batch1); sq.processAllAvailable()
    stream.addData(batch2); sq.processAllAvailable()
    sq.stop()

    val streamed = Checks.benfordFromCounts(
        StreamingIncremental.readTotals(spark, log)
          .filter(col("key").isNotNull)
          .select(col("key").cast("int").as("digit"), col("n")))
      .orderBy("digit").collect()
    val batch = Checks.benfordDigits(
        (batch1 ++ batch2).map(_._2).map(Tuple1(_)).toDF("v"),
        bround($"v" * 100.0))
      .orderBy("digit").collect()
    assert(streamed.length == 9 && batch.length == 9)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
    // the two excluded rows (0.0, -7.0) counted nowhere
    assert(streamed.map(_.getAs[Long]("n")).sum == 7L)
  }

  test("streaming moments log: JB and mean-diff monitors equal their batch forms") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingIncremental
    import graft.operators.{Profiling, StatTests}
    implicit val sqlCtx = spark.sqlContext
    val scratch = java.nio.file.Files.createTempDirectory("graft_stream_mom").toString
    val (log, ckpt) = (s"$scratch/moments", s"$scratch/ckpt")

    val batch1 = Seq(("a", 12L), ("a", 15L), ("b", 40L), ("a", 9L))
      .map { case (k, v) => (k, ts("2024-01-01 05:00:00"), v) }
    val batch2 = Seq(("a", 14L), ("b", 44L), ("b", 38L), ("b", 47L), ("a", 11L))
      .map { case (k, v) => (k, ts("2024-01-02 07:00:00"), v) }
    val all = (batch1 ++ batch2).map(t => (t._1, t._3)).toDF("k", "v")

    // the batch grouped JB picks m0 = floor(global mean); give the
    // standing monitor the same shift so results are BIT-identical
    val gm = all.agg(sum($"v").cast("double") / count(lit(1)).cast("double"))
      .head().getDouble(0)
    val m0 = math.floor(gm).toLong

    val stream = MemoryStream[(String, java.sql.Timestamp, Long)]
    val sq = StreamingIncremental.momentsSink(
      stream.toDF().toDF("k", "t", "v"), $"k", $"t", $"v", m0, 86400L, log, ckpt)
    stream.addData(batch1); sq.processAllAvailable()
    stream.addData(batch2); sq.processAllAvailable()
    sq.stop()

    val streamedJb = Profiling.normalityFromMoments(spark.read.parquet(log))
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    val batchJb = Profiling.normalityJarqueBeraBy(all, $"k", $"v")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    assert(streamedJb.keySet == Set("a", "b"))
    for (k <- Seq("a", "b"); f <- Seq("mean", "m2", "skewness", "kurtosis",
        "jb_stat", "p_value"))
      assert(streamedJb(k).getAs[Double](f) == batchJb(k).getAs[Double](f), s"$k.$f")

    // mean-diff monitor over the same log: cohort = key
    val streamedMd = StatTests.meanDiffZFromMoments(
      spark.read.parquet(log), inA = col("key") === "a").head()
    val batchMd = StatTests.meanDiffZ(all, $"v", $"k" === "a").head()
    assert(streamedMd.getAs[Long]("n_a") == batchMd.getAs[Long]("n_a"))
    // shift-invariant statistics agree to float noise (different but
    // stated dags: shifted vs raw sums)
    for (f <- Seq("mean_a", "mean_b", "var_a", "var_b", "mean_diff", "z"))
      assert(math.abs(streamedMd.getAs[Double](f) - batchMd.getAs[Double](f)) < 1e-9, f)

    // a key whose inA expression resolves to NULL is EXCLUDED (batch
    // parity), never silently bucketed into cohort B
    graft.operators.Incremental.bucketMoments(
      Seq(("c", ts("2024-01-03 00:00:00"), 999L)).toDF("k", "t", "v"),
      $"k", $"t", $"v", m0, 86400L)
      .write.mode("append").parquet(log)
    val inAB = when(col("key") === "a", true).when(col("key") === "b", false)
    val withNullKey = StatTests.meanDiffZFromMoments(
      spark.read.parquet(log), inA = inAB).head()
    assert(withNullKey.getAs[Long]("n_a") == batchMd.getAs[Long]("n_a"))
    assert(withNullKey.getAs[Long]("n_b") == batchMd.getAs[Long]("n_b"))
    for (f <- Seq("mean_a", "mean_b", "mean_diff", "z"))
      assert(math.abs(withNullKey.getAs[Double](f) - batchMd.getAs[Double](f)) < 1e-9,
        s"null-cohort key leaked into the statistic: $f")

    // mixed-shift logs are refused loudly
    graft.operators.Incremental.bucketMoments(
      Seq(("a", ts("2024-01-03 00:00:00"), 5L)).toDF("k", "t", "v"),
      $"k", $"t", $"v", m0 + 7L, 86400L)
      .write.mode("append").parquet(log)
    val ex = intercept[IllegalArgumentException] {
      StatTests.meanDiffZFromMoments(spark.read.parquet(log), col("key") === "a")
    }
    assert(ex.getMessage.contains("distinct shifts"))
  }

  test("streaming proportion monitor: struct-keyed counts log equals batch proportionZ bit for bit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingIncremental
    import graft.operators.StatTests
    implicit val sqlCtx = spark.sqlContext
    val scratch = java.nio.file.Files.createTempDirectory("graft_stream_prop").toString
    val (log, ckpt) = (s"$scratch/counts", s"$scratch/ckpt")

    val batch1 = Seq((true, true), (true, false), (false, true), (true, true))
      .map { case (a, sc) => (a, sc, ts("2024-01-01 03:00:00")) }
    val batch2 = Seq((false, false), (false, true), (true, false), (false, false))
      .map { case (a, sc) => (a, sc, ts("2024-01-02 03:00:00")) }
    val stream = MemoryStream[(Boolean, Boolean, java.sql.Timestamp)]
    val sq = StreamingIncremental.partialsSink(
      stream.toDF().toDF("a", "s", "t"),
      struct($"a", $"s"), $"t", lit(1L), 86400L, log, ckpt)
    stream.addData(batch1); sq.processAllAvailable()
    stream.addData(batch2); sq.processAllAvailable()
    sq.stop()

    val streamed = StatTests.proportionZFromCounts(
      StreamingIncremental.readTotals(spark, log),
      inA = col("key.a"), success = col("key.s")).head()
    val batch = StatTests.proportionZ(
      (batch1 ++ batch2).map(t => (t._1, t._2)).toDF("a", "s"),
      col("s"), col("a")).head()
    assert(streamed == batch)   // exact integers end to end: bit-equal rows
  }
}
