package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("Tables.events leaves the session nanosAsLong conf untouched for non-nanos layouts") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val ev = Tables.events(spark, TestSpark.sf)
    assert(ev.count() > 0)
    // the corpus under test is the micros/NTZ layout: the probe must
    // restore whatever was set before (here: unset/default), so other
    // nanos-timestamp parquets in the session keep fail-loud decoding
    assert(spark.conf.getOption(key) == before,
      s"events read must not leak $key for a non-nanos corpus")
    val evB = Tables.eventsBefore(spark, TestSpark.sf, "2024-06-01 00:00:00")
    assert(evB.count() >= 0)
    assert(spark.conf.getOption(key) == before)
  }

  test("as-of backward join: latest at-or-before value; simultaneous visible; null when none") {
    val left = Seq(
      (1L, 1, ts("2024-01-01 10:00:00")),   // before any snapshot → null
      (2L, 1, ts("2024-01-01 11:00:00")),   // exactly at snapshot → sees it
      (3L, 1, ts("2024-01-01 12:00:00")),   // after both → latest wins
      (4L, 2, ts("2024-01-01 12:00:00")))   // other key
      .toDF("id", "k", "t")
    val right = Seq(
      (1, ts("2024-01-01 11:00:00"), 10.0),
      (1, ts("2024-01-01 11:30:00"), 20.0),
      (2, ts("2024-01-01 09:00:00"), 30.0))
      .toDF("rk", "rt", "v")
    val out = Temporal.asOfJoinBackward(left, $"k", $"t", right, $"rk", $"rt",
        $"v", "asof_v")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L) == None)
    assert(out(2L) == Some(10.0))
    assert(out(3L) == Some(20.0))
    assert(out(4L) == Some(30.0))
  }

  test("as-of backward join: a matched snapshot with NULL value is returned as NULL, " +
      "not skipped for an older non-null one (DuckDB ASOF / merge_asof semantics)") {
    val left = Seq(
      (1L, 1, ts("2024-01-01 12:00:00")))   // after both snapshots
      .toDF("id", "k", "t")
    val right = Seq(
      (1, ts("2024-01-01 10:00:00"), Some(10.0)),
      (1, ts("2024-01-01 11:00:00"), None))  // latest snapshot: value IS null
      .toDF("rk", "rt", "v")
    val out = Temporal.asOfJoinBackward(left, $"k", $"t", right, $"rk", $"rt",
        $"v", "asof_v").collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(3), "latest snapshot's null value must win, not the older 10.0")
  }

  test("sessionize: strict-gap boundary, per-key independence") {
    val events = Seq(
      (1, ts("2024-01-01 10:00:00")),
      (1, ts("2024-01-01 10:59:59")),  // 59:59 gap → same session
      (1, ts("2024-01-01 12:00:00")),  // 60:01 gap → new session
      (1, ts("2024-01-01 13:00:00")),  // exactly 1h gap → same session (strict >)
      (2, ts("2024-01-01 10:00:00")))
      .toDF("u", "t")
    val out = Temporal.sessionize(events, $"u", $"t", gapSeconds = 3600)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(out((1, 1L)) == 2)  // first session: 2 events
    assert(out((1, 2L)) == 2)  // second: 12:00 + 13:00 (1h exactly → kept)
    assert(out((2, 1L)) == 1)
    assert(out.size == 3)
  }

  test("funnel: strict ordering per key, earliest-qualifying clock, monotone counts") {
    val rows = Seq(
      // u1 completes in order
      (1, ts("2024-01-01 10:00:00"), "a"),
      (1, ts("2024-01-01 11:00:00"), "b"),
      (1, ts("2024-01-01 12:00:00"), "c"),
      // u2: b BEFORE a — must not count for stage b
      (2, ts("2024-01-01 09:00:00"), "b"),
      (2, ts("2024-01-01 10:00:00"), "a"),
      // u3: a then b simultaneous with a (strict > excludes), later b ok
      (3, ts("2024-01-01 10:00:00"), "a"),
      (3, ts("2024-01-01 10:00:00"), "b"),   // same instant: excluded
      (3, ts("2024-01-01 10:30:00"), "b"),   // counts
      // u4: only c
      (4, ts("2024-01-01 10:00:00"), "c"))
      .toDF("u", "t", "e")
    val out = Temporal.funnel(rows, $"u", $"t", Seq(
        "a" -> ($"e" === "a"), "b" -> ($"e" === "b"), "c" -> ($"e" === "c")))
      .orderBy($"stage_seq").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 1L, 3L), ("b", 2L, 2L), ("c", 3L, 1L)))
    // earliest-qualifying clock: u1's c at 12:00 counts because b's
    // clock is 11:00 (not a later b); monotone by construction
    assert(out.map(_._3).toSeq == out.map(_._3).toSeq.sorted.reverse)
  }

  test("cohort retention: first-bucket cohorting, distinct actives per offset, gaps allowed") {
    val hour = 3600L
    val rows = Seq(
      // u1: cohort hour 0, active hours 0,1,3 (skips 2)
      (1, ts("2024-01-01 00:10:00")), (1, ts("2024-01-01 00:50:00")), // same bucket once
      (1, ts("2024-01-01 01:10:00")), (1, ts("2024-01-01 03:10:00")),
      // u2: cohort hour 0, never returns
      (2, ts("2024-01-01 00:20:00")),
      // u3: cohort hour 1, active hours 1,2
      (3, ts("2024-01-01 01:30:00")), (3, ts("2024-01-01 02:30:00")))
      .toDF("u", "t")
    val out = Temporal.cohortRetention(rows, $"u", $"t", hour)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val h0 = ts("2024-01-01 00:00:00").getTime * 1000L
    val h1 = h0 + hour * 1000000L
    assert(out == Map(
      (h0, 0L) -> 2L, (h0, 1L) -> 1L, (h0, 3L) -> 1L,   // hour-2 gap: no row
      (h1, 0L) -> 1L, (h1, 1L) -> 1L))
  }

  test("transition counts: per-key consecutive pairs only, first event has no transition") {
    val rows = Seq(
      (1, ts("2024-01-01 10:00:00"), "a"), (1, ts("2024-01-01 11:00:00"), "b"),
      (1, ts("2024-01-01 12:00:00"), "a"), (1, ts("2024-01-01 13:00:00"), "a"),
      (2, ts("2024-01-01 10:00:00"), "b"), (2, ts("2024-01-01 11:00:00"), "a"))
      .toDF("u", "t", "e")
    val out = Temporal.transitionCounts(rows, $"u", $"t", $"e")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // u1: a→b, b→a, a→a; u2: b→a. No cross-user pair (u1's 13:00 "a"
    // never chains into u2's 10:00 "b").
    assert(out == Map(("a", "b") -> 1L, ("b", "a") -> 2L, ("a", "a") -> 1L))
    assert(out.values.sum == 4L) // n_events - n_keys
  }

  test("scd2 intervals: runs collapse, half-open bounds chain, null is a legal version") {
    val rows = Seq(
      (1, ts("2024-01-01 10:00:00"), Some("a")),
      (1, ts("2024-01-01 11:00:00"), Some("a")),   // same run
      (1, ts("2024-01-01 12:00:00"), Some("b")),   // change
      (1, ts("2024-01-01 13:00:00"), None),        // null closes b's run
      (1, ts("2024-01-01 14:00:00"), None),        // same (null) run
      (1, ts("2024-01-01 15:00:00"), Some("a")),   // a again: NEW version
      (2, ts("2024-01-01 10:00:00"), Some("x")))
      .toDF("k", "t", "v")
    val out = Temporal.scd2Intervals(rows, $"k", $"t", $"v")
      .orderBy($"key", $"valid_from")
      .collect().map(r => (r.getInt(0), Option(r.getString(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1, Some("a"), ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 12:00:00")), false),
      (1, Some("b"), ts("2024-01-01 12:00:00"), Some(ts("2024-01-01 13:00:00")), false),
      (1, None,      ts("2024-01-01 13:00:00"), Some(ts("2024-01-01 15:00:00")), false),
      (1, Some("a"), ts("2024-01-01 15:00:00"), None, true),
      (2, Some("x"), ts("2024-01-01 10:00:00"), None, true)))
    // intervals tile each key's history: every consecutive pair chains
    assert(out.toVector.filter(_._1 == 1).sliding(2).forall {
      case Vector(a, b) => a._4.contains(b._3); case _ => true })
  }

  test("rolling bucket totals: RANGE frame skips absent buckets; weights sum as longs") {
    val dayUs = 86400L * 1000000L
    // key "a": days 0, 1, 8 — day 8's 2-day window must NOT reach back
    // to day 1 (a ROWS frame would); key "b" independent
    val events = Seq(
      ("a", ts("2024-01-01 05:00:00"), 10L),
      ("a", ts("2024-01-01 06:00:00"), 5L),
      ("a", ts("2024-01-02 05:00:00"), 1L),
      ("a", ts("2024-01-09 05:00:00"), 7L),
      ("b", ts("2024-01-02 12:00:00"), 100L))
      .toDF("k", "t", "w")
    val out = Temporal.rollingBucketTotals(events, $"k", $"t", $"w",
        bucketSeconds = 86400L, windowBuckets = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val base = ts("2024-01-01 00:00:00").getTime * 1000L
    assert(out(("a", base)) == (2L, 15L, 2L, 15L))
    assert(out(("a", base + dayUs)) == (1L, 1L, 3L, 16L))      // rolls over day 0
    assert(out(("a", base + 8 * dayUs)) == (1L, 7L, 1L, 7L))   // gap: window empty behind
    assert(out(("b", base + dayUs)) == (1L, 100L, 1L, 100L))   // keys independent
    assert(out.size == 4)
  }

  test("activity churn: retained/churned/new; keys matching neither period absent") {
    val cut = ts("2024-01-16 00:00:00")
    val events = Seq(
      (1, ts("2024-01-05 00:00:00"), "p"),  // prior only → churned
      (2, ts("2024-01-05 00:00:00"), "p"),  // both → retained
      (2, ts("2024-01-20 00:00:00"), "p"),
      (3, ts("2024-01-20 00:00:00"), "p"),  // current only → new
      (4, ts("2024-01-05 00:00:00"), "x"))  // matches neither predicate → absent
      .toDF("u", "t", "e")
    val out = Temporal.activityChurn(events, $"u",
        $"e" === "p" && $"t" < cut, $"e" === "p" && $"t" >= cut)
      .collect().map(r => r.getInt(0) -> r.getString(3)).toMap
    assert(out == Map(1 -> "churned", 2 -> "retained", 3 -> "new"))
  }

  test("arrival gaps: missing hours merge into intervals; dense stream has none; empty input empty") {
    val hourUs = 3600L * 1000000L
    // events in hours 0, 1, 4, 5, 6, 9 (of 2024-01-01) → gaps [2,4) and [7,9)
    val events = Seq(0, 1, 4, 5, 6, 9)
      .map(h => Tuple1(ts(f"2024-01-01 $h%02d:30:00"))).toDF("t")
    val gaps = Temporal.arrivalGaps(events, $"t", 3600)
      .orderBy($"gap_start_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // same local-tz rendering as the fixture rows, so the expected
    // bucket starts agree with unix_micros regardless of JVM zone
    val base = ts("2024-01-01 00:00:00").getTime * 1000L
    assert(gaps.toSeq == Seq(
      (base + 2 * hourUs, base + 4 * hourUs, 2L),
      (base + 7 * hourUs, base + 9 * hourUs, 2L)))
    // two events in one bucket produce no phantom gap; dense → empty
    val dense = Seq(0, 0, 1, 2).map(h => Tuple1(ts(f"2024-01-01 $h%02d:15:00"))).toDF("t")
    assert(Temporal.arrivalGaps(dense, $"t", 3600).count() == 0)
    val empty = Seq.empty[Tuple1[java.sql.Timestamp]].toDF("t")
    assert(Temporal.arrivalGaps(empty, $"t", 3600).count() == 0)
  }
}
