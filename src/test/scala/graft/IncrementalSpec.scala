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
}
