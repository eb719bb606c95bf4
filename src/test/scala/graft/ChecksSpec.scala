package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Checks

class ChecksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("completeness: nulls counted per column in one pass") {
    val df = Seq((Some(1), Some("a")), (Some(2), None), (None, None))
      .toDF("x", "y")
    val out = Checks.completeness(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out("x") == (2L, 2.0 / 3.0))
    assert(out("y") == (1L, 1.0 / 3.0))
  }

  test("uniqueness: composite keys; duplicates detected") {
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a")).toDF("k1", "k2")
    val r = Checks.uniqueness(df, Seq("k1", "k2"), "pk").head()
    assert(r.getLong(1) == 4 && r.getLong(2) == 3 && r.getDouble(3) == 0.75)
  }

  test("approx cardinality within rsd of exact on the corpus") {
    val cust = Tables.customer(spark, TestSpark.sf)
    val exact = cust.select(count_distinct($"c_custkey")).as[Long].head()
    val approx = Checks.approxCardinality(cust, Seq("c_custkey"), rsd = 0.02)
      .select("approx_distinct").as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("referential integrity: orphans via anti-join on keys only") {
    val child = Seq(1, 2, 3, 4).toDF("k")
    val parent = Seq(1, 2).toDF("p")
    val r = Checks.referentialIntegrity(child, $"k", parent, $"p", "c->p").head()
    assert(r.getString(0) == "c->p")
    assert(r.getLong(1) == 4 && r.getLong(2) == 2 && r.getDouble(3) == 0.5)
  }

  test("metric trend over an accumulating report: latest vs previous run, drift flag") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("trend").toString + "/report"
    def run(d: String, a: Long, b: Long): Unit =
      graft.sources.Sinks.writeAppend(
        Seq((1, a, java.sql.Date.valueOf(d)), (2, b, java.sql.Date.valueOf(d)))
          .toDF("site_id", "record_count", "date_created"), out)
    run("2026-08-10", 100L, 50L)
    run("2026-08-11", 104L, 50L)   // site 1: +4% ; site 2: flat
    run("2026-08-12", 160L, 50L)   // site 1: +54% → drift ; site 2: flat

    val trend = Checks.metricTrend(spark.read.parquet(out),
        Seq("site_id"), "record_count", "date_created", maxRelativeDrift = 0.10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(2), Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toMap
    assert(trend(1) == (160L, Some(104L), Some(56L), Some(true)))
    assert(trend(2) == (50L, Some(50L), Some(0L), Some(false)))
  }

  test("constraint suite: declared thresholds evaluate to one pass/fail report") {
    import graft.operators.Checks.Constraint
    val li = Tables.lineitem(spark, TestSpark.sf)
    val cust = Tables.customer(spark, TestSpark.sf)
    val suite = Checks.evaluateSuite(Seq(
      Constraint("pk_unique",
        Checks.uniqueness(cust, Seq("c_custkey"), "customer_pk"),
        "key_set", "uniqueness", minimum = 1.0),
      Constraint("pk_unique",
        Checks.uniqueness(li, Seq("l_orderkey", "l_linenumber"), "lineitem_pk"),
        "key_set", "uniqueness", minimum = 1.0),
      Constraint("fk_intact",
        Checks.referentialIntegrity(li, $"l_orderkey",
          Tables.orders(spark, TestSpark.sf), $"o_orderkey", "lineitem->orders"),
        "relation", "integrity", minimum = 1.0)))
    val rows = suite.collect()
      .map(r => r.getString(1) -> r.getBoolean(4)).toMap
    assert(rows("customer_pk"))            // clean PK passes
    assert(!rows("lineitem_pk"))           // real corpus duplication fails the gate
    assert(rows("lineitem->orders"))       // intact FK passes
  }

  test("value bounds: min/max/exact mean") {
    val df = Seq(1.0, 2.0, 3.0, 6.0).toDF("v")
    val r = Checks.valueBounds(df, Seq("v")).head()
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 6.0 && r.getDouble(4) == 3.0)
  }

  test("categoricalDrift: chi-square contributions, new and vanished categories") {
    // baseline: a=50, b=50; current: a=80, b=10, c=10 (c is new)
    val baseline = ((1 to 50).map(_ => "a") ++ (1 to 50).map(_ => "b")).toDF("k")
    val current = ((1 to 80).map(_ => "a") ++ (1 to 10).map(_ => "b") ++
      (1 to 10).map(_ => "c")).toDF("k")
    val rows = Checks.categoricalDrift(current, baseline, "k")
      .collect().map(r => r.getString(0) -> r).toMap
    // expected under baseline fractions: a=50, b=50
    assert(rows("a").getDouble(3) === 50.0 && rows("b").getDouble(3) === 50.0)
    assert(rows("a").getDouble(4) === 18.0)  // (80-50)^2/50
    assert(rows("b").getDouble(4) === 32.0)  // (10-50)^2/50
    assert(rows("c").isNullAt(3) && rows("c").isNullAt(4) && rows("c").getBoolean(5),
      "a category with no baseline mass has no finite contribution, flags new_category")
    // vanished category: current has none of 'b'
    val gone = Checks.categoricalDrift(
        ((1 to 10).map(_ => "a")).toDF("k"), baseline, "k")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(gone("b").getLong(1) === 0L && gone("b").getDouble(4) === 5.0,
      "a vanished category contributes its full expected count: (0-5)^2/5")
  }

  test("categoricalDrift: null categories match each other; empty current is undefined, not NaN") {
    val cur = Seq(Some("a"), None, None).toDF("k")
    val base = Seq(Some("a"), Some("a"), None).toDF("k")
    val rows = Checks.categoricalDrift(cur, base, "k").collect()
    assert(rows.length === 2, "null category must join itself, not split into two rows")
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) === 2L && nullRow.getLong(2) === 1L && !nullRow.getBoolean(5))
    val empty = Checks.categoricalDrift(
      Seq.empty[String].toDF("k"), base, "k").collect()
    assert(empty.forall(r => r.isNullAt(3) && r.isNullAt(4)),
      "empty current: contributions undefined (null), never 0/0 NaN")
  }

  test("numericDrift: shifted distribution registers, identical does not; schemaDrift reports changes") {
    val base = (1 to 100).map(_.toDouble % 50).toDF("v")
    val same = Checks.numericDrift(base, base, "v", binWidth = 10.0)
      .agg(org.apache.spark.sql.functions.sum("chi2_contribution")).head().getDouble(0)
    assert(same === 0.0, "identical distributions have zero statistic")
    val shifted = (1 to 100).map(i => (i.toDouble % 50) + 30).toDF("v")
    val stat = Checks.numericDrift(shifted, base, "v", binWidth = 10.0)
      .agg(org.apache.spark.sql.functions.sum("chi2_contribution")).head().getDouble(0)
    assert(stat > 10.0, s"a 30-unit shift must register, got $stat")

    val a = Seq((1L, "x", 1.0)).toDF("id", "kept", "widened")
    val b = Seq((1, "x")).toDF("id", "kept")
    val drift = Checks.schemaDrift(a, b).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(drift === Map("widened" -> "added", "id" -> "retyped"))
  }

  test("robustOutliers: MAD fences flag planted spikes without moving the median") {
    // 101 tight values around 10 (±0.05) plus two gross spikes — the
    // spikes would drag a mean/stddev fence far enough to hide
    // themselves (σ jumps from ~0.03 to ~140); the median/MAD fence
    // doesn't move.
    val base = Seq.tabulate(101)(i => ("a", (i - 50) * 0.001 + 10.0))
    val calm = Seq.tabulate(50)(i => ("b", i * 0.01))
    val df = (base :+ ("a", 1000.0) :+ ("a", -980.0)) ++ calm
    val out = Checks.robustOutliers(df.toDF("g", "v"), "v", "g")
      .collect().map(r => r.getString(0) -> r).toMap
    val ra = out("a")
    assert(math.abs(ra.getAs[Double]("median_value") - 10.0) < 0.001)
    assert(ra.getAs[Long]("n_outliers") == 2L)
    assert(ra.getAs[Long]("n") == 103L)
    assert(out("b").getAs[Long]("n_outliers") == 0L)
    // the sketch-based 100 TB mode agrees on this clear-cut fixture
    val approx = Checks.robustOutliers(df.toDF("g", "v"), "v", "g", exact = false)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_outliers")).toMap
    assert(approx("a") == 2L && approx("b") == 0L)
  }

  test("winsorizedStats: rank fences, clipped tails, winsorized mean hand-checked") {
    // values 1..100 in one group. Rank fences follow the DOCUMENTED
    // IEEE semantics: 0.05·100 rounds to exactly 5.0 (the error in
    // binary 0.05 is below half an ulp at magnitude 5), so
    // ceil = 5; 0.95·100 = 94.99999999999999 → ceil 95. Both engines
    // compute these identically, which is the contract.
    val df = (1 to 100).map(v => ("g", v.toDouble)).toDF("grp", "v")
    val r = Checks.winsorizedStats(df, "v", "grp").collect().head
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Double]("lo_fence") == 5.0)
    assert(r.getAs[Double]("hi_fence") == 95.0)
    assert(r.getAs[Long]("n_clipped_lo") == 4L)  // 1..4 clamp up to 5
    assert(r.getAs[Long]("n_clipped_hi") == 5L)  // 96..100 clamp down to 95
    // clamping adds 4+3+2+1 below and removes 1+..+5 above:
    // (5050 + 10 − 15) / 100
    assert(r.getAs[Double]("mean_winsorized") == 50.45)
  }

  test("quarantine: rejects carry every failed rule; null predicate violates; split is lossless") {
    val df = Seq(
      (1, Some(10), Some(0.02)),   // clean
      (2, Some(99), Some(0.02)),   // qty violation
      (3, Some(99), None),         // qty + null-discount violations
      (4, Some(10), Some(0.50)))   // discount violation
      .toDF("id", "qty", "disc")
    val rules = Seq(
      Checks.ValidationRule("qty_ok", $"qty" <= 40),
      Checks.ValidationRule("disc_ok", $"disc" <= 0.1))
    val (valid, rejects) = Checks.quarantine(df, rules)
    assert(valid.select("id").as[Int].collect().toSeq == Seq(1))
    val got = rejects.select($"id", $"violations").collect()
      .map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    assert(got == Map(
      2 -> List("qty_ok"), 3 -> List("qty_ok", "disc_ok"), 4 -> List("disc_ok")))
    assert(valid.count() + rejects.count() == df.count())
    // census agrees with the split, and ANY == reject count
    val rep = Checks.validationReport(df, rules)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rep == Map("qty_ok" -> 2L, "disc_ok" -> 2L, "ANY" -> 3L))
    // a pre-existing 'violations' column would be silently replaced
    // and then dropped on the valid side — refuse loudly instead
    intercept[IllegalArgumentException] {
      Checks.quarantine(df.withColumn("violations", lit("user data")), rules)
    }
    // loud guards: reserved/duplicate/unresolvable rule names
    intercept[IllegalArgumentException] {
      Checks.validationReport(df, rules :+ Checks.ValidationRule("ANY", lit(true)))
    }
    intercept[IllegalArgumentException] {
      Checks.validationReport(df, rules :+ Checks.ValidationRule("qty_ok", lit(true)))
    }
    intercept[IllegalArgumentException] {
      Checks.validationReport(df, Seq(Checks.ValidationRule("a.b", lit(true))))
    }
  }

  test("volumeAnomalies perWeekday: a weekly spike is normal seasonally, anomalous unseasoned") {
    def d(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")
    // 4 weeks: Mondays (2024-03-04 is a Monday) ~100 events, other
    // days ~10, small deterministic wiggle so baselines have variance
    val rows = (1 to 28).flatMap { day =>
      val isMonday = (day - 4) % 7 == 0
      val n = (if (isMonday) 100 else 10) + day % 3
      Seq.fill(n)(("a", d(day)))
    }.toDF("g", "t")
    def lastMondayFlag(perWeekday: Boolean): Option[Boolean] = {
      val r = Checks.volumeAnomalies(rows, $"g", $"t",
          trailing = 3, threshold = 2.0, perWeekday = perWeekday)
        .filter($"day" === java.sql.Date.valueOf("2024-03-25")) // 4th Monday
        .head()
      if (r.isNullAt(6)) None else Some(r.getBoolean(6))
    }
    assert(lastMondayFlag(perWeekday = false) == Some(true),
      "mixed-weekday baseline must flag the Monday spike")
    assert(lastMondayFlag(perWeekday = true) == Some(false),
      "same-weekday baseline must treat the Monday spike as seasonal")
  }

  test("floatAudit: every IEEE species counted once, finite remainder, clean column clean") {
    val df = Seq(
      Some(1.5), Some(-2.0), None,
      Some(Double.NaN), Some(Double.NaN),
      Some(Double.PositiveInfinity), Some(Double.NegativeInfinity))
      .toDF("x").withColumn("y", lit(7.0))
    val out = Checks.floatAudit(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(out("x") == ((7L, 1L, 2L, 1L, 1L, 2L)))
    assert(out("y") == ((7L, 0L, 0L, 0L, 0L, 7L)))
  }

  test("fdReport: holding FD zero violations; null rhs is a countable image; composite lhs") {
    val df = Seq(
      (1, "x", Some("a")),
      (1, "x", Some("a")),    // duplicate row: still one image
      (2, "x", Some("b")),
      (3, "y", Some("c")),
      (3, "y", None),         // null + value = TWO images → violation
      (4, "y", None))         // only null: one image, no violation
      .toDF("k", "tag", "v")
    val out = Checks.fdReport(df, Seq(
        Checks.FdSpec("k_determines_v", Seq($"k"), $"v"),
        Checks.FdSpec("ktag_determines_v", Seq($"k", $"tag"), $"v"),
        Checks.FdSpec("tag_determines_v", Seq($"tag"), $"v")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(out("k_determines_v") == ((4L, 1L, 2L)))     // only k=3 violates
    assert(out("ktag_determines_v") == ((4L, 1L, 2L)))
    // tag "x" → {a,b}, tag "y" → {c,null,null} = {c,NULL}: both violate
    assert(out("tag_determines_v") == ((2L, 2L, 2L)))
  }

  test("inclusionReport: contained, partial, and empty-child edges; duplicates don't inflate") {
    val child = Seq(1, 1, 2, 3, 3, 3).toDF("k")      // distinct {1,2,3}
    val parent = Seq(1, 2, 2, 9).toDF("p")           // distinct {1,2,9}
    val empty = Seq.empty[Int].toDF("k")
    val out = Checks.inclusionReport(Seq(
        Checks.InclusionSpec("full", child, $"k", child, $"k"),
        Checks.InclusionSpec("partial", child, $"k", parent, $"p"),
        Checks.InclusionSpec("empty", empty, $"k", parent, $"p")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    assert(out("full") == ((3L, 3L, Some(1.0))))
    assert(out("partial") == ((3L, 2L, Some(2.0 / 3.0))))
    assert(out("empty") == ((0L, 0L, None)))         // undefined, not NaN
  }

  test("volumeAnomalies: trailing baseline excludes current day; spike flagged, warmup null") {
    def d(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // group "a": 10/day for 6 days, then a day of 100 — the spike must
    // be scored against the stable trailing window, not itself
    val rows =
      (1 to 6).flatMap(day => Seq.fill(10)(("a", d(day)))) ++
        Seq.fill(100)(("a", d(7)))
    val out = Checks.volumeAnomalies(rows.toDF("g", "t"), $"g", $"t",
        trailing = 7, threshold = 2.0)
      .orderBy($"day").collect()
    assert(out.length == 7)
    // days 1-3: fewer than minPrior prior observations → null flag
    assert(out.take(3).forall(_.isNullAt(6)))
    // days 4-6: steady 10s, zero variance baseline → null flag (no scale)
    assert(out.slice(3, 6).forall(_.isNullAt(6)))
    // day 7: n=100 vs mean 10 — but the trailing σ is 0... so to get a
    // real flag, check a second group with organic variance
    val varied = Seq(8, 12, 9, 11, 10, 10).zipWithIndex.flatMap {
      case (n, i) => Seq.fill(n)(("b", d(i + 1))) } ++ Seq.fill(60)(("b", d(7)))
    val vb = Checks.volumeAnomalies(varied.toDF("g", "t"), $"g", $"t",
        trailing = 7, threshold = 2.0)
      .orderBy($"day").collect()
    val last = vb.last
    assert(last.getLong(2) == 60 && last.getBoolean(6))   // spike flagged
    assert(vb.slice(3, 6).forall(r => !r.getBoolean(6)))  // normal days aren't
  }

  test("joinSkewReport: hot key ranks first with exact contribution; right-only keys appear") {
    import graft.operators.Skew
    val left = (Seq.fill(50)(7) ++ Seq(1, 1, 2)).toDF("k")
    val right = (Seq.fill(4)(7) ++ Seq(1, 9)).toDF("j")
    val top = Skew.joinSkewReport(left, $"k", right, $"j", 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(top.head == ((7, 50L, 4L, 200L)))
    assert(top.toSeq.contains((9, 0L, 1L, 0L)))      // right-only key visible
    assert(top.toSeq.contains((2, 1L, 0L, 0L)))      // left-only key visible
    // zero-contribution ties break on the key ascending
    val zeros = top.filter(_._4 == 0L).map(_._1)
    assert(zeros.toSeq == zeros.toSeq.sorted)
  }

  test("benfordFirstDigit: hand-checked digits, ulp-safe power-of-ten edges, zero/null excluded") {
    val df = Seq[Option[Double]](
      Some(1.0), Some(19.5), Some(950.0), Some(0.02), Some(-3.7),
      Some(1000.0),                       // exact power of ten → digit 1
      Some(math.nextDown(1000.0)),        // just under → digit 9 (the fixup case)
      Some(0.0), None)                    // no first digit: excluded
      .toDF("v")
    val out = Checks.benfordFirstDigit(df, $"v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // digits: 1, 1, 9, 2, 3, 1, 9 → spine keeps all nine rows
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L,
      6L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 2L))
    val row = Checks.benfordFirstDigit(df, $"v")
      .filter($"digit" === 1).head()
    assert(row.getDouble(row.fieldIndex("observed_p")) == 3.0 / 7.0)
    assert(row.getDouble(row.fieldIndex("expected_p")) == math.log10(2.0))
    // chi-square contribution is finite and non-negative everywhere
    val chi = Checks.benfordFirstDigit(df, $"v")
      .collect().map(r => r.getDouble(r.fieldIndex("chi2_contribution")))
    assert(chi.forall(c => c >= 0.0 && !c.isNaN && !c.isInfinite))
  }

  test("privacyCensus: k and l violations counted exactly; null sensitive is a value") {
    val df = Seq(
      // class (Z1, 30): 3 rows, sensitive {a, a, b} → k ok (3>=3), l=2
      ("Z1", 30, Some("a")), ("Z1", 30, Some("a")), ("Z1", 30, Some("b")),
      // class (Z1, 40): 1 row → k violation; 1 distinct → l violation
      ("Z1", 40, Some("a")),
      // class (Z2, 30): 3 rows, sensitive {a, null, b} → null counts: l=3 ok
      ("Z2", 30, Some("a")), ("Z2", 30, None), ("Z2", 30, Some("b")))
      .toDF("zip", "age", "diag")
    val r = Checks.privacyCensus(df, Seq("zip", "age"), $"diag", k = 3, l = 3)
      .head()
    assert((r.getLong(0), r.getLong(1)) == ((7L, 3L)))
    assert((r.getLong(2), r.getLong(3)) == ((1L, 1L)), "one 1-row class under k=3")
    assert((r.getLong(4), r.getLong(5)) == ((2L, 4L)),
      "(Z1,30) l=2 and (Z1,40) l=1 violate l=3; 3+1 rows at risk")
    val off = Checks.privacyOffenders(df, Seq("zip", "age"), $"diag", k = 3, l = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(off.keySet == Set(("Z1", 30), ("Z1", 40)))
    assert(off(("Z1", 40)) == ((1L, 1L, true, true)))
    assert(off(("Z1", 30)) == ((3L, 2L, false, true)))
    // empty input: zero everything, no nulls
    val empty = Checks.privacyCensus(df.limit(0), Seq("zip", "age"), $"diag", 3, 3).head()
    assert((0 until 6).map(empty.getLong) == Seq(0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("suppressUnderK: kept side is k-anonymous by construction; null classes move whole") {
    val df = Seq(
      ("Z1", Some(30), 1L), ("Z1", Some(30), 2L), ("Z1", Some(30), 3L),
      ("Z1", Some(40), 4L),                        // 1-row class → suppressed
      (null: String, None, 5L), (null, None, 6L),  // null class of 2 → suppressed at k=3
      ("Z2", Some(30), 7L), ("Z2", Some(30), 8L), ("Z2", Some(30), 9L))
      .toDF("zip", "age", "id")
    val (kept, suppressed) = Checks.suppressUnderK(df, Seq("zip", "age"), k = 3)
    assert(kept.select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 7L, 8L, 9L))
    assert(suppressed.select("id").as[Long].collect().toSet == Set(4L, 5L, 6L),
      "the null-valued class must move WHOLE, not vanish from both sides")
    assert(kept.count() + suppressed.count() == df.count(), "split is lossless")
    // post-condition: the kept frame audits clean
    val audit = Checks.privacyCensus(kept, Seq("zip", "age"), lit(0), k = 3, l = 1)
      .head()
    assert(audit.getLong(2) == 0L, "kept side must have zero under-k classes")
  }

  test("orderInversions: adjacent pairs only, strict mode counts ties, null breaks no pair") {
    val rows = Seq(
      // u1: 1,3,2,5 → one inversion (3>2)
      (1, 1L, Some(1.0)), (1, 2L, Some(3.0)), (1, 3L, Some(2.0)), (1, 4L, Some(5.0)),
      // u2: monotone with a tie: 1,1,2 → 0 inversions lax, 1 strict
      (2, 1L, Some(1.0)), (2, 2L, Some(1.0)), (2, 3L, Some(2.0)),
      // u3: null interrupts: 5, null, 1 → no countable pair
      (3, 1L, Some(5.0)), (3, 2L, None), (3, 3L, Some(1.0)))
      .toDF("u", "o", "v")
    def collectMap(strict: Boolean) =
      Checks.orderInversions(rows, $"u", $"o", $"v", strict)
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toMap
    val lax = collectMap(strict = false)
    assert(lax == Map(
      1 -> ((4L, 1L, false)), 2 -> ((3L, 0L, true)), 3 -> ((3L, 0L, true))))
    val strict = collectMap(strict = true)
    assert(strict(2) == ((3L, 1L, false)), "a tie is an inversion under strict")
    assert(strict(1) == ((4L, 1L, false)))
  }

  test("quantileDrift: equal baseline mass per bin; shift registers; beyond-max lands in the top bin") {
    // baseline 1..100 → deciles of exactly 10; identical current drifts nowhere
    val base = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val same = Checks.quantileDrift(base, base, "v", col("id"), 10).collect()
    assert(same.length == 10)
    assert(same.forall(r => r.getLong(2) == 10L), "deciles must carry equal baseline mass")
    assert(same.map(_.getDouble(4)).sum == 0.0)
    // current shifted past the baseline max: everything piles into bin 10
    val far = (1 to 100).map(i => (i.toLong, i + 1000.0)).toDF("id", "v")
    val drift = Checks.quantileDrift(far, base, "v", col("id"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drift(10L) == 100L, "beyond-baseline values must land in the open top bin")
    assert((1L to 9L).forall(b => drift(b) == 0L))
    // a null in current forms its own bin row via the null-safe join
    val withNull = Seq((1L, Some(5.0)), (2L, None)).toDF("id", "v")
    val nullRow = Checks.quantileDrift(withNull, base, "v", col("id"), 10)
      .filter(col("bin").isNull).collect()
    assert(nullRow.length == 1 && nullRow.head.getLong(1) == 1L,
      "null values must register as their own drift category")
  }

  test("embeddingDrift: hand-checked shift in sigmas; constant baseline dim yields null sigmas") {
    // baseline dim0: {1,3} (mean 2, sd sqrt(2)); dim1 constant 5
    val base = Seq(Seq(1.0f, 5.0f), Seq(3.0f, 5.0f)).toDF("embedding")
    // current dim0: {3,5} (mean 4 -> shift +2 = sqrt(2) sigmas); dim1 {5,7}
    val cur = Seq(Seq(3.0f, 5.0f), Seq(5.0f, 7.0f)).toDF("embedding")
    val byDim = Checks.embeddingDrift(cur, base, "embedding")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d0 = byDim(0L)
    assert(d0.getDouble(3) == 2.0 && d0.getDouble(4) == 4.0)
    assert(d0.getDouble(5) == 2.0, "raw mean shift")
    assert(math.abs(d0.getDouble(6) - math.sqrt(2.0)) < 1e-12,
      "shift of 2 over sd sqrt(2) is sqrt(2) sigmas")
    val d1 = byDim(1L)
    assert(d1.getDouble(5) == 1.0, "dim1 mean moved 5 -> 6")
    assert(d1.isNullAt(6) && d1.isNullAt(9),
      "a zero-variance baseline dimension cannot scale a shift")
    // ragged corpora: a dimension present on one side only survives
    // the full-outer join as a half-null row instead of vanishing
    val wide = Seq(Seq(1.0f, 2.0f, 9.0f), Seq(3.0f, 4.0f, 11.0f)).toDF("embedding")
    val extra = Checks.embeddingDrift(wide, base, "embedding")
      .filter(col("dim") === 2L).collect()
    assert(extra.length == 1 && extra.head.isNullAt(1) && extra.head.getLong(2) == 2L)
  }

  // ---------------- benfordDigits ----------------

  test("benfordDigits: geometric data conforms, uniform data does not") {
    import org.apache.spark.sql.functions._
    // 2^k mod-spread: a multiplicative process — classic Benford
    val geo = spark.range(0, 1000)
      .select(pow(lit(1.3), col("id").cast("double") % 60.0).cast("long").as("v"))
      .filter(col("v") > 0L)
    val conform = Checks.benfordDigits(geo, col("v")).head()
    // uniform ints 10000..99999: every first digit equally likely
    val uni = spark.range(10000, 100000).select(col("id").as("v"))
    val flat = Checks.benfordDigits(uni, col("v")).head()
    assert(conform.getAs[Double]("mad") < flat.getAs[Double]("mad"))
    assert(flat.getAs[Double]("mad") > 0.015)   // Nigrini nonconformity
    assert(conform.getAs[Double]("chi2_stat") < flat.getAs[Double]("chi2_stat"))
  }

  test("benfordDigits: 9-row spine with zero counts; nulls and non-positives excluded") {
    import org.apache.spark.sql.functions._
    val df = Seq[Option[Long]](Some(100L), Some(123L), Some(199L), Some(201L),
      Some(0L), Some(-5L), None).toDF("v")
    val out = Checks.benfordDigits(df, col("v")).orderBy("digit").collect()
    assert(out.length == 9)
    assert(out.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val n = out.map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n")).toMap
    assert(n(1) == 3L && n(2) == 1L && (3 to 9).forall(n(_) == 0L))
    // observed_p sums to 1 over the spine
    val obs = out.map(_.getAs[Double]("observed_p")).sum
    assert(math.abs(obs - 1.0) < 1e-12)
    // expected_p matches the shared literal table
    assert(out.head.getAs[Double]("expected_p") == Checks.BenfordP.head.toDouble)
  }

  test("benfordDigitsBy: grouped equals solo per group; NULL groups excluded") {
    import org.apache.spark.sql.functions._
    val geo = (0 until 400).map(i => ("geo", math.pow(1.3, (i % 60).toDouble).toLong))
    val uni = (10000 until 10300).map(i => ("uni", i.toLong))
    val nul = Seq((null.asInstanceOf[String], 123L))
    val df = (geo ++ uni ++ nul).toDF("g", "v").filter(col("v") > 0L)
    val grouped = Checks.benfordDigitsBy(df, col("g"), col("v"))
      .collect().groupBy(_.getAs[String]("group_key"))
    assert(grouped.keySet == Set("geo", "uni"))
    for (g <- Seq("geo", "uni")) {
      val solo = Checks.benfordDigits(df.filter(col("g") === g), col("v"))
        .orderBy("digit").collect()
      val grp = grouped(g).sortBy(_.getAs[Int]("digit"))
        .map(r => (r.getAs[Int]("digit"), r.getAs[Long]("n"),
          r.getAs[Double]("observed_p"), r.getAs[Double]("chi2_contrib"),
          r.getAs[Double]("chi2_stat"), r.getAs[Double]("mad")))
      val sol = solo.map(r => (r.getAs[Int]("digit"), r.getAs[Long]("n"),
        r.getAs[Double]("observed_p"), r.getAs[Double]("chi2_contrib"),
        r.getAs[Double]("chi2_stat"), r.getAs[Double]("mad")))
      assert(grp.toSeq == sol.toSeq, s"group $g")
    }
  }
}
