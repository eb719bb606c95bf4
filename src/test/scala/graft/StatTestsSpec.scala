package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Evaluation, StatTests}

class StatTestsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------- ksTwoSample ----------------

  test("ksTwoSample matches the hand-computed sup-CDF-gap") {
    // A = {1,2,3}, B = {2,3,4}; distinct values 1,2,3,4
    // F_A = 1/3, 2/3, 1, 1 ; F_B = 0, 1/3, 2/3, 1
    // gaps all 1/3 mathematically — but in IEEE doubles
    // 2/3 − 1/3 ≠ 1/3 by one ulp, so state the SAME dag the engine
    // (and the oracle) computes: per-value |cumA/3 − cumB/3|.
    val gaps = Seq(
      1.0 -> math.abs(1.0 / 3.0 - 0.0 / 3.0),
      2.0 -> math.abs(2.0 / 3.0 - 1.0 / 3.0),
      3.0 -> math.abs(3.0 / 3.0 - 2.0 / 3.0),
      4.0 -> math.abs(3.0 / 3.0 - 3.0 / 3.0))
    val d = gaps.map(_._2).max
    val at = gaps.filter(_._2 == d).map(_._1).min
    val df = Seq(
      (1.0, true), (2.0, true), (3.0, true),
      (2.0, false), (3.0, false), (4.0, false)).toDF("v", "a")
    val r = StatTests.ksTwoSample(df, $"v", $"a").head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("n_distinct_values") == 4L)
    assert(r.getAs[Double]("ks_stat") == d)
    assert(math.abs(r.getAs[Double]("ks_stat") - 1.0 / 3.0) < 1e-15)
    assert(r.getAs[Double]("ks_at") == at)
    assert(r.getAs[Double]("ks_z") ==
      math.sqrt(3.0 * 3.0 / 6.0) * d)
  }

  test("exact ties at the sup break to the smallest value (single-pass argmax pin)") {
    // A = {1,3}, B = {2,4}: gaps are exactly 0.5, 0.0, 0.5, 0.0 —
    // bit-equal doubles at v=1 and v=3 — so ks_at must be the SMALLEST
    // tied value in every form (the r21 struct-min single-pass
    // aggregation must tie-break exactly like the old max-then-rejoin)
    val df = Seq((1.0, true), (3.0, true), (2.0, false), (4.0, false))
      .toDF("v", "a")
    val solo = StatTests.ksTwoSample(df, $"v", $"a").head()
    assert(solo.getAs[Double]("ks_stat") == 0.5 && solo.getAs[Double]("ks_at") == 1.0)
    val grouped = Seq(
      ("g1", 1.0, true), ("g1", 3.0, true), ("g1", 2.0, false), ("g1", 4.0, false),
      ("g2", 1.0, true), ("g2", 3.0, true), ("g2", 2.0, false), ("g2", 4.0, false))
      .toDF("g", "v", "a")
    StatTests.ksTwoSampleBy(grouped, $"g", $"v", $"a").collect().foreach { r =>
      assert(r.getAs[Double]("ks_stat") == 0.5 && r.getAs[Double]("ks_at") == 1.0)
    }
  }

  test("KS direct-window path is bit-identical to the cell path (all four forms)") {
    // the r21 cardinality-adaptive direct path must produce the same
    // rows as the cell/offset machinery — force each path via
    // directWindowRows (Long.MaxValue = always direct, 0 = always cell)
    val rnd = new scala.util.Random(97)
    val rows = (1 to 500).map { i =>
      val g = s"s${i % 4}"
      val a = i % 3 != 0
      (g, math.rint((rnd.nextGaussian() + (if (a) 0.3 else 0.0)) * 8) / 8, a)
    }
    val df = rows.toDF("g", "v", "a")
    def same(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame): Unit = {
      assert(x.exceptAll(y).count() == 0 && y.exceptAll(x).count() == 0)
      assert(x.count() == y.count())
    }
    same(StatTests.ksTwoSample(df, $"v", $"a", directWindowRows = Long.MaxValue),
      StatTests.ksTwoSample(df, $"v", $"a", directWindowRows = 0L))
    same(StatTests.ksTwoSampleBy(df, $"g", $"v", $"a", directWindowRows = Long.MaxValue),
      StatTests.ksTwoSampleBy(df, $"g", $"v", $"a", directWindowRows = 0L))
    same(StatTests.ksGroupVsRest(df, $"g", $"v", directWindowRows = Long.MaxValue),
      StatTests.ksGroupVsRest(df, $"g", $"v", directWindowRows = 0L))
    def t(i: Int) = java.sql.Timestamp.valueOf(f"2024-03-${1 + i % 4}%02d 10:00:00")
    val ts = rows.zipWithIndex.map { case ((_, v, _), i) => (t(i), v) }.toDF("ts", "v")
    same(
      StatTests.ksAdjacentPeriods(ts, $"ts", $"v", 86400L, directWindowRows = Long.MaxValue),
      StatTests.ksAdjacentPeriods(ts, $"ts", $"v", 86400L, directWindowRows = 0L))
  }

  test("cusum peak ties break to the earliest bucket (single-pass argmax pin)") {
    // masses 2,1,1,2 over buckets 0..3s: scaled deviations 2,0,-2,0 —
    // |.| ties at buckets 0 and 2; the flagged peak must be bucket 0
    val df = Seq((0L, 1), (0L, 1), (1L, 1), (2L, 1), (3L, 1), (3L, 1))
      .toDF("s", "x")
      .select(timestamp_seconds($"s").as("ts"), $"x")
    val r = StatTests.cusumChangePoint(df, $"ts", bucketSeconds = 1L)
      .collect().sortBy(_.getAs[Long]("bucket_start_us"))
    assert(r.map(_.getAs[Boolean]("is_peak")).toSeq ==
      Seq(true, false, false, false))
  }

  test("ksTwoSample: identical distributions give D = 0; disjoint give D = 1") {
    val same = Seq((1.0, true), (2.0, true), (1.0, false), (2.0, false))
      .toDF("v", "a")
    assert(StatTests.ksTwoSample(same, $"v", $"a").head()
      .getAs[Double]("ks_stat") == 0.0)
    // every A value strictly below every B value: the gap hits 1 at
    // the largest A value
    val apart = Seq((1.0, true), (2.0, true), (5.0, false), (6.0, false))
      .toDF("v", "a")
    val r = StatTests.ksTwoSample(apart, $"v", $"a").head()
    assert(r.getAs[Double]("ks_stat") == 1.0)
    assert(r.getAs[Double]("ks_at") == 2.0)
  }

  test("ksTwoSample: NULL cohort rows and NULL/NaN values are excluded") {
    val df = Seq(
      (Some(1.0), Some(true)), (Some(2.0), Some(true)),
      (Some(2.0), Some(false)), (Some(3.0), Some(false)),
      (Some(9.0), None),                  // cohort unknown -> dropped
      (None, Some(true)),                 // null value -> dropped
      (Some(Double.NaN), Some(false)))    // NaN value -> dropped
      .toDF("v", "a")
    val r = StatTests.ksTwoSample(df, $"v", $"a").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("n_distinct_values") == 3L)
    // A={1,2}, B={2,3}: gaps 1/2, 1/2, 0 -> D=1/2 at v=1
    assert(r.getAs[Double]("ks_stat") == 0.5)
    assert(r.getAs[Double]("ks_at") == 1.0)
  }

  test("ksTwoSample: an empty cohort yields NULL statistics, not 0") {
    val df = Seq((1.0, true), (2.0, true)).toDF("v", "a")
    val r = StatTests.ksTwoSample(df, $"v", $"a").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 0L)
    assert(r.isNullAt(r.fieldIndex("ks_stat")))
    assert(r.isNullAt(r.fieldIndex("ks_at")))
    assert(r.isNullAt(r.fieldIndex("ks_z")))
    val empty = spark.emptyDataset[(Double, Boolean)].toDF("v", "a")
    val e = StatTests.ksTwoSample(empty, $"v", $"a").head()
    assert(e.getAs[Long]("n_a") == 0L && e.getAs[Long]("n_b") == 0L)
    assert(e.isNullAt(e.fieldIndex("ks_stat")))
  }

  test("ksTwoSample: cell count does not change the statistic (cells-machinery invariance)") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val a = i % 3 != 0
      (if (a) rnd.nextGaussian() else rnd.nextGaussian() + 0.4, a)
    }
    val df = rows.toDF("v", "a")
    val r1 = StatTests.ksTwoSample(df, $"v", $"a", cells = 1).head()
    val r2 = StatTests.ksTwoSample(df, $"v", $"a", cells = 4096).head()
    assert(r1.getAs[Double]("ks_stat") == r2.getAs[Double]("ks_stat"))
    assert(r1.getAs[Double]("ks_at") == r2.getAs[Double]("ks_at"))
  }

  // ---------------- ksGroupVsRest ----------------

  test("ksGroupVsRest with two groups equals ksTwoSample against the other group, both directions") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      (g, math.rint((rnd.nextGaussian() + (if (g == "a") 0.6 else 0.0)) * 8) / 8)
    }
    val df = rows.toDF("g", "v")
    val grouped = graft.operators.StatTests.ksGroupVsRest(df, $"g", $"v")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    val solo = graft.operators.StatTests
      .ksTwoSample(df, $"v", $"g" === "a").head()
    // group "a" vs rest IS cohort-a vs cohort-b; D is symmetric
    assert(grouped("a").getAs[Double]("ks_stat") == solo.getAs[Double]("ks_stat"))
    assert(grouped("b").getAs[Double]("ks_stat") == solo.getAs[Double]("ks_stat"))
    assert(grouped("a").getAs[Long]("n_group") == solo.getAs[Long]("n_a"))
    assert(grouped("a").getAs[Long]("n_rest") == solo.getAs[Long]("n_b"))
    assert(grouped("a").getAs[Double]("ks_z") == solo.getAs[Double]("ks_z"))
    // ks_at: the same sup is attained at the same (global) value set
    assert(grouped("a").getAs[Double]("ks_at") == grouped("b").getAs[Double]("ks_at"))
  }

  test("ksGroupVsRest: the planted-shift group carries the largest D; ordering is stable across cells") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 600).map { i =>
      val g = s"s${i % 3}"
      val shift = if (g == "s1") 1.5 else 0.0
      (g, math.rint((rnd.nextGaussian() + shift) * 6) / 6)
    }
    val df = rows.toDF("g", "v")
    def stats(cells: Int): Map[String, Double] =
      graft.operators.StatTests.ksGroupVsRest(df, $"g", $"v", cells = cells)
        .collect()
        .map(r => r.getAs[String]("group_key") -> r.getAs[Double]("ks_stat"))
        .toMap
    val d = stats(4096)
    assert(d("s1") > d("s0") && d("s1") > d("s2"))
    assert(stats(1) == d) // cell machinery cannot change the value
  }

  test("ksGroupVsRest: null groups excluded; a group that is the whole corpus gets NULL statistics") {
    val df = Seq(
      (Some("a"), 1.0), (Some("a"), 2.0), (None, 9.0))
      .toDF("g", "v")
    val rows = graft.operators.StatTests.ksGroupVsRest(df, $"g", $"v").collect()
    assert(rows.length == 1)
    val a = rows.head
    assert(a.getAs[Long]("n_group") == 2L && a.getAs[Long]("n_rest") == 0L)
    assert(a.isNullAt(a.fieldIndex("ks_stat")))
    assert(a.isNullAt(a.fieldIndex("ks_z")))
  }

  // ---------------- ksAdjacentPeriods ----------------

  test("ksAdjacentPeriods: each adjacent-day pair equals ksTwoSample on the two days; gaps break the chain") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rnd = new scala.util.Random(41)
    // day1 ~ N(0,1), day2 ~ N(0.5,1), day4 ~ N(0,1); day3 missing
    def day(d: String, shift: Double, n: Int) =
      (1 to n).map(i => (t(s"2024-03-0$d ${10 + i % 8}:0${i % 6}:00"),
        math.rint((rnd.nextGaussian() + shift) * 4) / 4))
    val rows = day("1", 0.0, 40) ++ day("2", 0.5, 50) ++ day("4", 0.0, 30)
    val df = rows.toDF("ts", "v")
    val out = graft.operators.StatTests
      .ksAdjacentPeriods(df, $"ts", $"v", bucketSeconds = 86400L)
      .collect().map(r => r.getAs[Long]("bucket_start_us") -> r).toMap
    // only the 1->2 pair exists (day 3 missing breaks 2->3 and 3->4)
    assert(out.size == 1)
    val pair = out.values.head
    assert(pair.getAs[Long]("n_left") == 40L && pair.getAs[Long]("n_right") == 50L)
    assert(pair.getAs[Long]("next_start_us") ==
      pair.getAs[Long]("bucket_start_us") + 86400000000L)
    // cross-pin against the solo two-sample statistic on the same rows
    val combined = rows.filter(_._1.getTime < t("2024-03-03 00:00:00").getTime)
      .map { case (ts, v) => (v, ts.getTime < t("2024-03-02 00:00:00").getTime) }
      .toDF("v", "a")
    val solo = graft.operators.StatTests.ksTwoSample(combined, $"v", $"a").head()
    assert(pair.getAs[Double]("ks_stat") == solo.getAs[Double]("ks_stat"))
    assert(pair.getAs[Double]("ks_at") == solo.getAs[Double]("ks_at"))
    assert(pair.getAs[Double]("ks_z") == solo.getAs[Double]("ks_z"))
    assert(pair.getAs[Long]("n_distinct_values") ==
      solo.getAs[Long]("n_distinct_values"))
  }

  test("ksAdjacentPeriods: identical adjacent days give D = 0; null ts and NaN values excluded") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val base = Seq(1.0, 2.0, 3.0)
    val rows =
      base.map(v => (Some(t("2024-03-01 10:00:00")), v)) ++
      base.map(v => (Some(t("2024-03-02 10:00:00")), v)) ++
      Seq((None, 9.0), (Some(t("2024-03-02 11:00:00")), Double.NaN))
    val df = rows.toDF("ts", "v")
    val out = graft.operators.StatTests
      .ksAdjacentPeriods(df, $"ts", $"v", bucketSeconds = 86400L)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("ks_stat") == 0.0)
    assert(out.head.getAs[Long]("n_left") == 3L &&
      out.head.getAs[Long]("n_right") == 3L)
  }

  // ---------------- categoricalDriftTimeline ----------------

  test("categoricalDriftTimeline: hand-computed 2x2 pair; one-sided keys carry zero counts; identical days contribute 0") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // day1: a=3, b=1 ; day2: a=1, b=2, c=1 ; day3 identical to day2
    def mk(d: Int, k: String, n: Int) =
      Seq.fill(n)((t(f"2024-05-0$d%d 12:00:00"), k))
    val rows = mk(1, "a", 3) ++ mk(1, "b", 1) ++
      mk(2, "a", 1) ++ mk(2, "b", 2) ++ mk(2, "c", 1) ++
      mk(3, "a", 1) ++ mk(3, "b", 2) ++ mk(3, "c", 1)
    val df = rows.toDF("ts", "k")
    val out = graft.operators.StatTests
      .categoricalDriftTimeline(df, $"ts", $"k", bucketSeconds = 86400L)
      .collect()
      .map(r => (r.getAs[Long]("bucket_start_us"), r.getAs[String]("key")) -> r)
      .toMap
    val day1 = out.keys.map(_._1).min
    val day2 = out.keys.map(_._1).max
    assert(out.size == 6) // pair1: a,b,c ; pair2: a,b,c
    // pair day1->day2, key c: absent on the left
    val c1 = out((day1, "c"))
    assert(c1.getAs[Long]("n_left") == 0L && c1.getAs[Long]("n_right") == 1L)
    assert(c1.getAs[Long]("left_total") == 4L && c1.getAs[Long]("right_total") == 4L)
    // hand chi-square for key a in pair 1: e_l = 4*4/8 = 2, e_r = 2
    val a1 = out((day1, "a"))
    assert(a1.getAs[Double]("chi2_contribution") ==
      (3.0 - 2.0) * (3.0 - 2.0) / 2.0 + (1.0 - 2.0) * (1.0 - 2.0) / 2.0)
    assert(a1.getAs[Double]("rate_gap") == 3.0 / 4.0 - 1.0 / 4.0)
    // pair day2->day3 (identical mixes): every contribution exactly 0
    val p2 = out.filter(_._1._1 == day2).values
    assert(p2.nonEmpty && p2.forall(_.getAs[Double]("chi2_contribution") == 0.0))
    assert(p2.forall(_.getAs[Double]("rate_gap") == 0.0))
  }

  // ---------------- cusumChangePoint ----------------

  test("cusumChangePoint: planted level shift peaks at the shift boundary with hand-computed values") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // days 1-4 at rate 10, days 5-8 at rate 20: D=8, N=120
    // scaled(k<=4) = 8*10k - 120k = -40k  (min at k=4: -160)
    // scaled(k>4)  = 40k - 320            (back to 0 at k=8)
    val rows = (1 to 8).flatMap { d =>
      val rate = if (d <= 4) 10 else 20
      (1 to rate).map(i => t(f"2024-06-0$d%d ${8 + i % 10}%02d:00:00"))
    }
    val out = graft.operators.StatTests
      .cusumChangePoint(rows.map(Tuple1(_)).toDF("ts"), $"ts", 86400L)
      .collect().sortBy(_.getAs[Long]("bucket_start_us"))
    assert(out.length == 8)
    val scaled = out.map(_.getAs[Double]("cusum_scaled"))
    assert(scaled.take(4).toSeq == Seq(-40.0, -80.0, -120.0, -160.0))
    assert(scaled(7) == 0.0)
    assert(out(3).getAs[Boolean]("is_peak"), "peak |CUSUM| must mark day 4")
    assert(out.count(_.getAs[Boolean]("is_peak")) == 1)
    assert(out(3).getAs[Double]("cusum") == -160.0 / 8.0)
    assert(out(3).getAs[Long]("cum_n") == 40L)
  }

  test("cusumChangePoint: constant rate gives all-zero CUSUM; peak defaults to the earliest bucket") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = (1 to 5).flatMap { d =>
      (1 to 7).map(i => t(f"2024-06-1$d%d ${9 + i}%02d:00:00")) }
    val out = graft.operators.StatTests
      .cusumChangePoint(rows.map(Tuple1(_)).toDF("ts"), $"ts", 86400L)
      .collect().sortBy(_.getAs[Long]("bucket_start_us"))
    assert(out.forall(_.getAs[Double]("cusum_scaled") == 0.0))
    assert(out.head.getAs[Boolean]("is_peak") && out.count(_.getAs[Boolean]("is_peak")) == 1)
  }

  test("cusumChangePointBy: per-key series equals the solo CUSUM per key; shifted key peaks, steady key stays flat") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows =
      (1 to 8).flatMap { d =>
        val shifted = (1 to (if (d <= 4) 10 else 20)).map(i =>
          (t(f"2024-06-0$d%d ${8 + i % 10}%02d:00:00"), "shifted"))
        val steady = (1 to 6).map(i =>
          (t(f"2024-06-0$d%d ${8 + i}%02d:00:00"), "steady"))
        shifted ++ steady
      }
    val df = rows.toDF("ts", "k")
    val grouped = graft.operators.StatTests
      .cusumChangePointBy(df, $"ts", $"k", 86400L)
      .collect()
      .groupBy(_.getAs[String]("key"))
    for ((k, g) <- grouped) {
      val solo = graft.operators.StatTests
        .cusumChangePoint(df.filter($"k" === k).select($"ts"), $"ts", 86400L)
        .collect().map(r => r.getAs[Long]("bucket_start_us") -> r).toMap
      g.foreach { r =>
        val s = solo(r.getAs[Long]("bucket_start_us"))
        assert(r.getAs[Double]("cusum_scaled") == s.getAs[Double]("cusum_scaled"))
        assert(r.getAs[Boolean]("is_peak") == s.getAs[Boolean]("is_peak"))
      }
    }
    val steadyRows = grouped("steady").sortBy(_.getAs[Long]("bucket_start_us"))
    assert(steadyRows.forall(_.getAs[Double]("cusum_scaled") == 0.0))
    val shiftPeak = grouped("shifted").filter(_.getAs[Boolean]("is_peak"))
    assert(shiftPeak.length == 1)
    assert(shiftPeak.head.getAs[Double]("cusum_scaled") == -160.0)
  }

  test("cusumChangePointWeighted: value-level shift invisible to the count form peaks; null weights carry rows but no mass") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // constant volume (5 rows/day), value steps 1.0 -> 3.0 after day 4
    val rows = (1 to 8).flatMap { d =>
      val v = if (d <= 4) 1.0 else 3.0
      (1 to 5).map(i => (t(f"2024-07-0$d%d ${9 + i}%02d:00:00"), Option(v)))
    } :+ ((t("2024-07-01 20:00:00"), Option.empty[Double]))
    val df = rows.toDF("ts", "v")
    val wq = graft.operators.StatTests.cusumChangePointWeighted(
        df, $"ts", bround($"v" * 100).cast("long"), 86400L)
      .collect().sortBy(_.getAs[Long]("bucket_start_us"))
    assert(wq.length == 8)
    // day 1 has the extra null-weight row: 6 rows, mass still 500
    assert(wq(0).getAs[Long]("n") == 6L && wq(0).getAs[Long]("w_sum") == 500L)
    // D=8, W=8000: scaled(k<=4) = 8*500k - 1000k = 3000k... no:
    // 8*500k - k*8000 = 4000k - 8000k = -4000k, min at k=4 (-16000)
    assert(wq(3).getAs[Double]("cusum_scaled") == -16000.0)
    assert(wq(3).getAs[Boolean]("is_peak") && wq.count(_.getAs[Boolean]("is_peak")) == 1)
    assert(wq(7).getAs[Double]("cusum_scaled") == 0.0)
    // the COUNT form sees almost nothing (only the one extra row)
    val cq = graft.operators.StatTests.cusumChangePoint(
        df.select($"ts"), $"ts", 86400L)
      .collect().sortBy(_.getAs[Long]("bucket_start_us"))
    assert(math.abs(cq.map(_.getAs[Double]("cusum_scaled")).map(math.abs).max) <= 8.0)
  }

  // ---------------- rankSumTest ----------------

  test("rankSumTest: U agrees with aucExact (U = AUC * n1 * n2) and z matches the direct formula") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      val y = i % 4 == 0
      // coarse grid -> plenty of ties to exercise the correction
      (math.rint((rnd.nextGaussian() + (if (y) 0.5 else 0.0)) * 4) / 4, y)
    }
    val df = rows.toDF("s", "y")
    val r = Evaluation.rankSumTest(df, $"s", $"y").head()
    val auc = Evaluation.aucExact(df, $"s", $"y").head().getAs[Double]("auc")
    val (n1, n2) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
    val u = r.getAs[Double]("u")
    assert(u == auc * (n1 * n2).toDouble)
    // direct single-node formula over the same rows
    val byScore = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val tie = byScore.values.map(t => t.toLong * t * t - t).sum.toDouble
    assert(r.getAs[Double]("tie_term") == tie)
    val (d1, d2) = (n1.toDouble, n2.toDouble)
    val dn = (n1 + n2).toDouble
    val varU = d1 * d2 / 12.0 * ((dn + 1.0) - tie / (dn * (dn - 1.0)))
    val zExpected = (2.0 * u - d1 * d2) / (2.0 * math.sqrt(varU))
    assert(math.abs(r.getAs[Double]("z") - zExpected) < 1e-12)
  }

  test("rankSumTest: all scores tied -> zero variance -> NULL z; single class -> NULL z") {
    val tied = Seq((1.0, true), (1.0, true), (1.0, false)).toDF("s", "y")
    val r = Evaluation.rankSumTest(tied, $"s", $"y").head()
    assert(r.getAs[Double]("u") == 1.0) // 2 pos half-tie 1 neg
    assert(r.isNullAt(r.fieldIndex("z")))
    val onePos = Seq((1.0, true), (2.0, true)).toDF("s", "y")
    val p = Evaluation.rankSumTest(onePos, $"s", $"y").head()
    assert(p.getAs[Long]("n_neg") == 0L && p.isNullAt(p.fieldIndex("z")))
    val empty = spark.emptyDataset[(Double, Boolean)].toDF("s", "y")
    val e = Evaluation.rankSumTest(empty, $"s", $"y").head()
    assert(e.getAs[Long]("n_distinct_scores") == 0L &&
      e.isNullAt(e.fieldIndex("z")))
  }

  test("rankSumTestBy: per-group z equals rankSumTest run on each group alone") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 240).map { i =>
      val g = s"g${i % 3}"
      val y = i % 5 == 0
      (g, math.rint((rnd.nextGaussian() + (if (y) 0.7 else 0.0)) * 5) / 5, y)
    }
    val df = rows.toDF("g", "s", "y")
    val grouped = Evaluation.rankSumTestBy(df, $"g", $"s", $"y")
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    assert(grouped.keySet == Set("g0", "g1", "g2"))
    for (g <- grouped.keySet) {
      val solo = Evaluation.rankSumTest(
        df.filter($"g" === g), $"s", $"y").head()
      val gr = grouped(g)
      assert(gr.getAs[Long]("n_pos") == solo.getAs[Long]("n_pos"))
      assert(gr.getAs[Long]("n_neg") == solo.getAs[Long]("n_neg"))
      assert(gr.getAs[Double]("u") == solo.getAs[Double]("u"))
      assert(gr.getAs[Double]("tie_term") == solo.getAs[Double]("tie_term"))
      assert(gr.getAs[Double]("z") == solo.getAs[Double]("z"))
    }
    // null-group rows are excluded, not a phantom group
    val withNull = rows.map { case (g, s, y) => (Option(g).filter(_ != "g0"), s, y) }
      .toDF("g", "s", "y")
    val g2 = Evaluation.rankSumTestBy(withNull, $"g", $"s", $"y").collect()
    assert(g2.map(_.getAs[String]("group_key")).toSet == Set("g1", "g2"))
  }

  test("rankSumTest: balanced symmetric data gives z = 0 exactly") {
    // pos and neg identically distributed -> U = n1*n2/2 exactly
    val df = Seq(
      (1.0, true), (2.0, true), (1.0, false), (2.0, false)).toDF("s", "y")
    val r = Evaluation.rankSumTest(df, $"s", $"y").head()
    assert(r.getAs[Double]("u") == 2.0)
    assert(r.getAs[Double]("z") == 0.0)
  }

  // ---------------- contingencyChiSquare ----------------

  test("contingencyChiSquare matches the hand-computed 2x2 table") {
    // table: (x,p)=10 (x,q)=20 / (y,p)=30 (y,q)=40
    val rows =
      Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(30)(("y", "p")) ++ Seq.fill(40)(("y", "q"))
    val df = rows.toDF("r", "c")
    val out = StatTests.contingencyChiSquare(df, $"r", $"c")
      .collect().map(r => ((r.getAs[String]("row_key"), r.getAs[String]("col_key")), r))
      .toMap
    assert(out.size == 4)
    val xp = out(("x", "p"))
    assert(xp.getAs[Long]("n") == 10L)
    assert(xp.getAs[Long]("row_total") == 30L)
    assert(xp.getAs[Long]("col_total") == 40L)
    assert(xp.getAs[Long]("grand_total") == 100L)
    assert(xp.getAs[Double]("expected") == 30.0 * 40.0 / 100.0) // 12
    assert(xp.getAs[Double]("contribution") == (10.0 - 12.0) * (10.0 - 12.0) / 12.0)
    assert(xp.getAs[Double]("residual") == (10.0 - 12.0) / math.sqrt(12.0))
    // chi2 statistic = sum of contributions:
    // N(ad-bc)^2 / (r1 r2 c1 c2) = 100*200^2/(30*70*40*60) = 50/63
    val chi2 = out.values.map(_.getAs[Double]("contribution")).sum
    assert(math.abs(chi2 - 50.0 / 63.0) < 1e-12)
  }

  test("contingencyChiSquare: exact independence gives zero contributions") {
    // counts proportional: every cell = row share x col share
    val rows =
      Seq.fill(4)(("x", "p")) ++ Seq.fill(8)(("x", "q")) ++
      Seq.fill(2)(("y", "p")) ++ Seq.fill(4)(("y", "q"))
    val out = StatTests.contingencyChiSquare(rows.toDF("r", "c"), $"r", $"c")
      .collect()
    assert(out.forall(_.getAs[Double]("contribution") == 0.0))
    assert(out.forall(_.getAs[Double]("residual") == 0.0))
  }

  test("contingencyChiSquare: absent pairs appear on the spine with n = 0 and contribution = expected") {
    // (y,q) never observed
    val rows = Seq(("x", "p"), ("x", "q"), ("y", "p"))
    val out = StatTests.contingencyChiSquare(rows.toDF("r", "c"), $"r", $"c")
      .collect().map(r => ((r.getAs[String]("row_key"), r.getAs[String]("col_key")), r))
      .toMap
    assert(out.size == 4)
    val yq = out(("y", "q"))
    assert(yq.getAs[Long]("n") == 0L)
    val e = yq.getAs[Double]("expected")
    assert(e == 1.0 * 1.0 / 3.0)
    assert(yq.getAs[Double]("contribution") == (0.0 - e) * (0.0 - e) / e)
  }

  test("contingencyChiSquare: NULL keys on either side are excluded") {
    val rows = Seq(
      (Some("x"), Some("p")), (Some("x"), Some("q")),
      (None, Some("p")), (Some("y"), None))
    val out = StatTests.contingencyChiSquare(rows.toDF("r", "c"), $"r", $"c")
      .collect()
    assert(out.map(_.getAs[Long]("n")).sum == 2L)
    assert(out.forall(_.getAs[Long]("grand_total") == 2L))
    assert(!out.exists(r => r.getAs[String]("row_key") == "y" ||
      r.getAs[String]("col_key") == null))
  }

  // ---------------- ksTwoSampleBy / randomProjectionKs ----------------

  test("ksTwoSampleBy equals the solo ksTwoSample per group") {
    val rows = Seq(
      // group g1: A = {1,2,3}, B = {2,3,4}
      ("g1", 1.0, true), ("g1", 2.0, true), ("g1", 3.0, true),
      ("g1", 2.0, false), ("g1", 3.0, false), ("g1", 4.0, false),
      // group g2: disjoint cohorts
      ("g2", 1.0, true), ("g2", 2.0, true),
      ("g2", 5.0, false), ("g2", 6.0, false),
      // group g3: only cohort A -> NULL stats, row kept
      ("g3", 7.0, true),
      // NULL group and NULL cohort rows are excluded
      (null.asInstanceOf[String], 1.0, true))
      .toDF("g", "v", "a")
    val by = StatTests.ksTwoSampleBy(rows, $"g", $"v", $"a").collect()
      .map(r => r.getAs[String]("group_key") -> r).toMap
    assert(by.keySet == Set("g1", "g2", "g3"))
    for (g <- Seq("g1", "g2")) {
      val solo = StatTests.ksTwoSample(
        rows.filter($"g" === g), $"v", $"a").head()
      assert(by(g).getAs[Long]("n_a") == solo.getAs[Long]("n_a"))
      assert(by(g).getAs[Long]("n_b") == solo.getAs[Long]("n_b"))
      assert(by(g).getAs[Long]("n_distinct_values") ==
        solo.getAs[Long]("n_distinct_values"))
      assert(by(g).getAs[Double]("ks_stat") == solo.getAs[Double]("ks_stat"),
        s"group $g ks_stat must equal the solo statistic")
      assert(by(g).getAs[Double]("ks_at") == solo.getAs[Double]("ks_at"))
      assert(by(g).getAs[Double]("ks_z") == solo.getAs[Double]("ks_z"))
    }
    assert(by("g3").getAs[Long]("n_a") == 1L)
    assert(by("g3").getAs[Long]("n_b") == 0L)
    assert(by("g3").isNullAt(by("g3").fieldIndex("ks_stat")),
      "a one-cohort group must report NULL stats, not crash or drop")
  }

  test("projectionMatrix is deterministic, ±1-valued, and shape-correct") {
    val a = StatTests.projectionMatrix(64, 8, 42L)
    val b = StatTests.projectionMatrix(64, 8, 42L)
    assert(a == b, "same (dims, k, seed) must give the same matrix")
    assert(a.size == 8 && a.forall(_.size == 64))
    assert(a.flatten.forall(w => w == 1.0 || w == -1.0))
    // not degenerate: both signs occur, and rows differ
    assert(a.flatten.toSet == Set(1.0, -1.0))
    assert(a.distinct.size == 8, "axes must be distinct")
    assert(StatTests.projectionMatrix(64, 8, 43L) != a,
      "a different seed must give a different matrix")
  }

  test("randomProjectionKs catches a rotational shift that per-dim profiles miss") {
    // Two 2-D corpora with IDENTICAL per-dimension marginals:
    //   baseline: (v_i, v_{9-i}) — anti-correlated
    //   current:  (v_i, v_i)     — perfectly correlated
    // Per-dim mean/stddev (q110's instrument) see NOTHING; any ±1
    // projection axis separates them (difference axis: baseline
    // spreads over {-7..7}, current collapses to 0; sum axis:
    // baseline collapses to 9, current spreads).
    val vs = (1 to 8).map(_.toDouble)
    val baseline = vs.zip(vs.reverse)
      .map { case (x, y) => Tuple1(Array(x.toFloat, y.toFloat)) }
      .toDF("embedding")
    val current = vs.map(x => Tuple1(Array(x.toFloat, x.toFloat)))
      .toDF("embedding")
    // q110 blindness: per-dim profile drift is exactly zero
    val prof = graft.operators.Checks.embeddingDrift(
      current = current, baseline = baseline, vecCol = "embedding").collect()
    assert(prof.nonEmpty)
    assert(prof.forall(_.getAs[Double]("mean_shift") == 0.0),
      "per-dim means must be identical by construction")
    assert(prof.forall(_.getAs[Double]("stddev_ratio") == 1.0),
      "per-dim stddevs must be identical by construction")
    // the projection ensemble sees it
    val k = 8
    val m = StatTests.projectionMatrix(2, k, 42L)
    assert(m.exists(w => w(0) != w(1)) && m.exists(w => w(0) == w(1)),
      "seed 42 must yield both difference-type and sum-type axes (fixture sanity)")
    val out = StatTests.randomProjectionKs(
      current, baseline, "embedding", dims = 2, k = k, seed = 42L).collect()
    assert(out.length == k)
    val mx = out.head.getAs[Double]("ks_ensemble_max")
    assert(mx >= 0.5, s"ensemble max KS must flag the rotation, got $mx")
    assert(out.forall(_.getAs[Double]("ks_ensemble_max") == mx))
    // per-axis equality with the solo statistic on hand-computed
    // projections (the same sequential-fold dot)
    val axis = out.map(r => r.getAs[Long]("axis") -> r).toMap
    for (j <- 0 until k) {
      val w = m(j)
      def proj(xs: Seq[(Double, Double)]) =
        xs.map { case (x, y) => x * w(0) + y * w(1) }
      val solo = StatTests.ksTwoSample(
        (proj(vs.map(x => (x, x))).map((_, true)) ++
          proj(vs.zip(vs.reverse)).map((_, false))).toDF("v", "a"),
        $"v", $"a").head()
      assert(axis(j.toLong).getAs[Double]("ks_stat") ==
        solo.getAs[Double]("ks_stat"), s"axis $j must equal solo KS")
    }
    // ensemble mean: quantized order-free mean of the per-axis stats
    val expMean = out.map(r =>
      math.rint(r.getAs[Double]("ks_stat") * 1e15).toLong)
      .sum.toDouble / 1e15 / k.toDouble
    assert(out.head.getAs[Double]("ks_ensemble_mean") == expMean)
  }

  // ---------------- kolmogorovPValue ----------------

  test("kolmogorovPValue: known critical values, clamps, NULL propagation") {
    val zs = Seq[java.lang.Double](1.358, 1.628, 0.1, 0.30, 5.0, null, 0.5)
    val df = zs.zipWithIndex
      .map { case (z, i) => (i, Option(z).map(_.doubleValue)) }
      .toDF("i", "z")
    val got = df
      .withColumn("p", StatTests.kolmogorovPValue(col("z")))
      .orderBy("i").collect().map(r => Option(r.get(2)).map(_.asInstanceOf[Double]))
    // classic alpha=0.05 / alpha=0.01 critical values of K
    assert(math.abs(got(0).get - 0.05) < 2e-3)
    assert(math.abs(got(1).get - 0.01) < 1e-3)
    assert(got(2).get == 1.0)                 // below-grid clamp
    // z exactly at the grid start interpolates from the first cell
    assert(math.abs(got(3).get - StatTests.KolmogorovQGrid.head.toDouble) < 1e-12)
    assert(got(4).get == StatTests.KolmogorovQGrid.last.toDouble) // above-grid clamp
    assert(got(5).isEmpty)                    // NULL z -> NULL p
    // interior sanity: Q(0.5) ~ 0.9639 (Smirnov tables)
    assert(math.abs(got(6).get - 0.9639) < 1e-3)
  }

  test("kolmogorovPValue is monotone non-increasing across the grid range") {
    val df = spark.range(0, 330).select((col("id") * 0.01).as("z"))
    val ps = df.withColumn("p", StatTests.kolmogorovPValue(col("z")))
      .orderBy("z").select("p").collect().map(_.getDouble(0))
    ps.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    assert(ps.head == 1.0 && ps.last < 1e-7)
  }

  test("normalPTwoSided: known critical values, symmetry, clamps, NULL") {
    val zs = Seq[java.lang.Double](1.96, -1.96, 2.5758, 0.0, 7.0, null)
    val df = zs.zipWithIndex
      .map { case (z, i) => (i, Option(z).map(_.doubleValue)) }
      .toDF("i", "z")
    val got = df.withColumn("p", StatTests.normalPTwoSided(col("z")))
      .orderBy("i").collect().map(r => Option(r.get(2)).map(_.asInstanceOf[Double]))
    assert(math.abs(got(0).get - 0.05) < 1e-3)
    assert(got(1).get == got(0).get)          // symmetric in z
    assert(math.abs(got(2).get - 0.01) < 1e-3)
    assert(got(3).get == 1.0)                 // z = 0: p = 2 * 0.5
    assert(got(4).get == 2.0 * StatTests.NormalSfGrid.last.toDouble) // clamp
    assert(got(5).isEmpty)
  }

  // ---------------- meanDiffZ ----------------

  test("meanDiffZ matches the hand-computed moments dag; fences for degenerate cohorts") {
    // A = {10, 12, 14}, B = {20, 24}
    val df = Seq((10L, true), (12L, true), (14L, true),
      (20L, false), (24L, false)).toDF("v", "a")
    val r = StatTests.meanDiffZ(df, col("v"), col("a")).head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    val meanA = 36.0 / 3.0; val meanB = 44.0 / 2.0
    val varA = (440.0 - 36.0 * 36.0 / 3.0) / 2.0   // sample variance
    val varB = (976.0 - 44.0 * 44.0 / 2.0) / 1.0
    assert(r.getAs[Double]("mean_a") == meanA && r.getAs[Double]("mean_b") == meanB)
    assert(r.getAs[Double]("var_a") == varA && r.getAs[Double]("var_b") == varB)
    val z = (meanA - meanB) / math.sqrt(varA / 3.0 + varB / 2.0)
    assert(r.getAs[Double]("z") == z)
    assert(r.getAs[Double]("p_two_sided") > 0 && r.getAs[Double]("p_two_sided") < 1)
    // single-row cohort: no sample variance, z NULL (not a crash)
    val tiny = Seq((10L, true), (20L, false), (21L, false)).toDF("v", "a")
    val rt = StatTests.meanDiffZ(tiny, col("v"), col("a")).head()
    assert(rt.isNullAt(rt.fieldIndex("var_a")) && rt.isNullAt(rt.fieldIndex("z")))
    // both cohorts constant: zero standard error, z NULL
    val const = Seq((5L, true), (5L, true), (9L, false), (9L, false)).toDF("v", "a")
    val rc = StatTests.meanDiffZ(const, col("v"), col("a")).head()
    assert(rc.getAs[Double]("var_a") == 0.0 && rc.isNullAt(rc.fieldIndex("z")))
    // empty cohort: means report, z NULL
    val solo = Seq((5L, true), (6L, true)).toDF("v", "a")
    val rs = StatTests.meanDiffZ(solo, col("v"), col("a")).head()
    assert(rs.getAs[Long]("n_b") == 0L && rs.isNullAt(rs.fieldIndex("z")))
  }

  test("meanDiffZBy: grouped equals solo per group; NULL group/cohort excluded") {
    val df = Seq(
      ("g1", 10L, Some(true)), ("g1", 12L, Some(true)), ("g1", 20L, Some(false)),
      ("g1", 22L, Some(false)),
      ("g2", 5L, Some(true)), ("g2", 9L, Some(true)), ("g2", 5L, Some(false)),
      ("g2", 1L, Some(false)),
      (null.asInstanceOf[String], 99L, Some(true)), ("g1", 7L, None))
      .toDF("g", "v", "a")
    val grouped = StatTests.meanDiffZBy(df, col("g"), col("v"), col("a"))
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    assert(grouped.keySet == Set("g1", "g2"))
    for (g <- Seq("g1", "g2")) {
      val solo = StatTests.meanDiffZ(df.filter(col("g") === g), col("v"), col("a")).head()
      val gr = grouped(g)
      for (f <- Seq("n_a", "n_b"))
        assert(gr.getAs[Long](f) == solo.getAs[Long](f), s"$g.$f")
      for (f <- Seq("mean_a", "mean_b", "var_a", "var_b", "mean_diff", "z", "p_two_sided"))
        assert(gr.getAs[Double](f) == solo.getAs[Double](f), s"$g.$f")
    }
  }

  // ---------------- proportionZ ----------------

  test("proportionZ matches the hand dag; z^2 equals the 2x2 chi-square; fences") {
    // A: 30 of 100 succeed; B: 20 of 100
    val rows = Seq.tabulate(200) { i =>
      val a = i < 100
      val s = if (a) i < 30 else i < 120
      (a, s)
    }
    val df = rows.toDF("a", "s")
    val r = StatTests.proportionZ(df, col("s"), col("a")).head()
    assert(r.getAs[Long]("n_a") == 100L && r.getAs[Long]("s_a") == 30L)
    assert(r.getAs[Long]("n_b") == 100L && r.getAs[Long]("s_b") == 20L)
    val pool = 50.0 / 200.0
    val z = (30.0 / 100.0 - 20.0 / 100.0) /
      math.sqrt(pool * (1.0 - pool) * (1.0 / 100.0 + 1.0 / 100.0))
    assert(r.getAs[Double]("z") == z)
    // z^2 == Pearson chi-square of the same 2x2 (within float
    // tolerance: different but algebraically identical dags)
    val chi = StatTests.contingencyChiSquare(df, col("a"), col("s"))
    val chi2 = chi.collect().map(_.getAs[Double]("contribution")).sum
    assert(math.abs(z * z - chi2) < 1e-9)
    // all-success pool: no variance, z NULL
    val allS = Seq((true, true), (false, true)).toDF("a", "s")
    val ra = StatTests.proportionZ(allS, col("s"), col("a")).head()
    assert(ra.isNullAt(ra.fieldIndex("z")))
    // empty cohort and NULL-outcome exclusion
    val mixed = Seq((Some(true), Some(true)), (Some(true), None),
      (None, Some(false))).toDF("a", "s")
    val rm = StatTests.proportionZ(mixed, col("s"), col("a")).head()
    assert(rm.getAs[Long]("n_a") == 1L && rm.getAs[Long]("n_b") == 0L)
    assert(rm.isNullAt(rm.fieldIndex("z")))
  }

  test("proportionZBy: grouped equals solo per group") {
    val df = Seq(
      ("x", true, true), ("x", true, false), ("x", false, true), ("x", false, true),
      ("y", true, true), ("y", true, true), ("y", false, false), ("y", false, true))
      .toDF("g", "a", "s")
    val grouped = StatTests.proportionZBy(df, col("g"), col("s"), col("a"))
      .collect().map(r => r.getAs[String]("group_key") -> r).toMap
    for (g <- Seq("x", "y")) {
      val solo = StatTests.proportionZ(df.filter(col("g") === g), col("s"), col("a")).head()
      for (f <- Seq("n_a", "n_b", "s_a", "s_b"))
        assert(grouped(g).getAs[Long](f) == solo.getAs[Long](f), s"$g.$f")
      for (f <- Seq("rate_a", "rate_b", "z", "p_two_sided"))
        assert(grouped(g).getAs[Double](f) == solo.getAs[Double](f), s"$g.$f")
    }
  }

  // ---------------- benjaminiHochberg ----------------

  test("benjaminiHochberg flags the textbook discovery set; NULLs pass through") {
    // m=6, alpha=0.25; sorted p: .01 .02 .04 .12 .2 .9
    // criticals k*alpha/m: .0417 .0833 .125 .1667 .2083 .25
    // k* = 5 (p=.2 <= .2083 — step-up: k=6 fails, k=5 holds);
    // discoveries = p <= p(5) = .2
    val df = Seq(("a", 0.12), ("b", 0.01), ("c", 0.9), ("d", 0.04),
      ("e", 0.02), ("f", 0.2)).toDF("id", "p")
      .unionByName(Seq(("g", null.asInstanceOf[java.lang.Double]))
        .toDF("id", "p"))
    val out = StatTests.benjaminiHochberg(df, col("p"), col("id"), alpha = 0.25)
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(out.size == 7)
    val discovered = out.values.filter(_.getAs[Boolean]("is_discovery"))
      .map(_.getAs[String]("id")).toSet
    assert(discovered == Set("b", "e", "d", "a", "f"))
    assert(out("b").getAs[Long]("p_rank") == 1L)
    assert(out("d").getAs[Long]("p_rank") == 3L)
    // m excludes the NULL row: critical for rank 1 is alpha/6
    assert(out("b").getAs[Double]("bh_critical") == 1.0 * 0.25 / 6.0)
    assert(out("g").isNullAt(out("g").fieldIndex("p_rank")))
    assert(!out("g").getAs[Boolean]("is_discovery"))
    // canonical check: every discovery p <= p(k*), every
    // non-discovery p > p(k*)
    val kp = 0.2
    out.values.filter(r => !r.isNullAt(r.fieldIndex("p"))).foreach { r =>
      assert(r.getAs[Boolean]("is_discovery") == (r.getAs[Double]("p") <= kp))
    }
  }

  test("benjaminiHochberg: tied p-values get a deterministic rank and one decision") {
    val df = Seq(("x", 0.03), ("y", 0.03), ("z", 0.5)).toDF("id", "p")
    val out = StatTests.benjaminiHochberg(df, col("p"), col("id"), alpha = 0.1)
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    // ties ranked by the tie-break column: x -> 1, y -> 2
    assert(out("x").getAs[Long]("p_rank") == 1L)
    assert(out("y").getAs[Long]("p_rank") == 2L)
    // k* = 2 (0.03 <= 2*0.1/3): BOTH tied rows share the decision
    assert(out("x").getAs[Boolean]("is_discovery"))
    assert(out("y").getAs[Boolean]("is_discovery"))
    assert(!out("z").getAs[Boolean]("is_discovery"))
  }

  // ---------------- theilSenTrend ----------------

  private def tsAt(day: Int, hour: Int = 6) =
    java.sql.Timestamp.valueOf(f"2024-02-${day}%02d $hour%02d:00:00")

  test("theilSenTrend: exact median pairwise slope; outage day cannot wreck it") {
    // volumes 2,4,6,8,10 over five days: every pairwise slope is
    // exactly 2/day -> median 2, min=max=2
    val rows = (1 to 5).flatMap(d => Seq.fill(2 * d)(Tuple1(tsAt(d))))
    val r = StatTests.theilSenTrend(rows.toDF("ts"), col("ts"), 86400L).head()
    assert(r.getAs[Long]("n_buckets") == 5L && r.getAs[Long]("n_pairs") == 10L)
    assert(r.getAs[Double]("slope_per_bucket") == 2.0)
    assert(r.getAs[Double]("slope_min") == 2.0 && r.getAs[Double]("slope_max") == 2.0)
    // same trend plus one catastrophic outage day (day 3 empty —
    // ZERO-FILLED, not skipped): the median slope stays near 2 while
    // min/max blow out — the robustness this estimator exists for
    val out = (1 to 5).filter(_ != 3).flatMap(d => Seq.fill(2 * d)(Tuple1(tsAt(d))))
    val ro = StatTests.theilSenTrend(out.toDF("ts"), col("ts"), 86400L).head()
    assert(ro.getAs[Long]("n_buckets") == 5L, "the empty day must be spine-filled")
    assert(math.abs(ro.getAs[Double]("slope_per_bucket") - 2.0) <= 1.0)
    assert(ro.getAs[Double]("slope_min") < -3.0)   // the crash into day 3
  }

  test("theilSenTrend: empty input shape; bucket-quadratic guard is loud") {
    val empty = Seq.empty[Tuple1[java.sql.Timestamp]].toDF("ts")
    val re = StatTests.theilSenTrend(empty, col("ts"), 86400L).head()
    assert(re.getAs[Long]("n_buckets") == 0L &&
      re.isNullAt(re.fieldIndex("slope_per_bucket")))
    val two = Seq(Tuple1(tsAt(1)), Tuple1(tsAt(5))).toDF("ts")
    val ex = intercept[IllegalArgumentException] {
      StatTests.theilSenTrend(two, col("ts"), 86400L, maxBuckets = 3)
    }
    assert(ex.getMessage.contains("quadratic"))
  }

  test("theilSenTrendBy: grouped equals solo per key on the shared spine") {
    val rows =
      (1 to 5).flatMap(d => Seq.fill(2 * d)(("up", tsAt(d)))) ++
      (1 to 5).flatMap(d => Seq.fill(12 - 2 * d)(("down", tsAt(d)))) ++
      Seq.fill(3)(("spiky", tsAt(2)))   // present one day only: zero-filled elsewhere
    val df = rows.toDF("k", "ts")
    val grouped = StatTests.theilSenTrendBy(df, col("k"), col("ts"), 86400L)
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(grouped.keySet == Set("up", "down", "spiky"))
    assert(grouped("up").getAs[Double]("slope_per_bucket") == 2.0)
    assert(grouped("down").getAs[Double]("slope_per_bucket") == -2.0)
    // solo over the same calendar (all keys share min/max days here)
    for (k <- Seq("up", "down")) {
      val solo = StatTests.theilSenTrend(
        df.filter(col("k") === k).select(col("ts")), col("ts"), 86400L).head()
      val gr = grouped(k)
      assert(gr.getAs[Long]("n_pairs") == solo.getAs[Long]("n_pairs"), k)
      assert(gr.getAs[Double]("slope_per_bucket") ==
        solo.getAs[Double]("slope_per_bucket"), k)
    }
    // the one-day key sees the shared 5-day spine: 10 pairs, median 0
    assert(grouped("spiky").getAs[Long]("n_pairs") == 10L)
    assert(grouped("spiky").getAs[Double]("slope_per_bucket") == 0.0)
  }

  test("mannKendallTrend: hand-computed S/variance/z; flat series gives z=0; ties corrected") {
    // strictly rising 1,2,3,4,5 over 5 days: S = 10 (all pairs +1),
    // no value ties: var = 5*4*15/18
    val rising = (1 to 5).flatMap(d => Seq.fill(d)(Tuple1(tsAt(d))))
    val r = StatTests.mannKendallTrend(rising.toDF("ts"), col("ts"), 86400L).head()
    assert(r.getAs[Long]("s_statistic") == 10L)
    val varS = (5.0 * 4.0 * 15.0 - 0.0) / 18.0
    assert(r.getAs[Double]("var_s") == varS)
    assert(r.getAs[Double]("z") == (10.0 - 1.0) / math.sqrt(varS))
    assert(r.getAs[Double]("p_two_sided") < 0.05)
    // constant volume: every pair tied -> S = 0, z = 0, p = 1
    val flat = (1 to 5).flatMap(d => Seq.fill(3)(Tuple1(tsAt(d))))
    val rf = StatTests.mannKendallTrend(flat.toDF("ts"), col("ts"), 86400L).head()
    assert(rf.getAs[Long]("s_statistic") == 0L)
    // ALL five values tied: the tie term kills the whole variance
    assert(rf.getAs[Double]("var_s") == 0.0)
    assert(rf.isNullAt(rf.fieldIndex("z")))   // no variance: undefined, not 0/0
    // partial ties: days 1,2 have 2 events, days 3..5 have 7
    val pt = (1 to 2).flatMap(d => Seq.fill(2)(Tuple1(tsAt(d)))) ++
      (3 to 5).flatMap(d => Seq.fill(7)(Tuple1(tsAt(d))))
    val rp = StatTests.mannKendallTrend(pt.toDF("ts"), col("ts"), 86400L).head()
    assert(rp.getAs[Long]("s_statistic") == 6L)  // only the 2x3 cross pairs count
    val vt = 2.0 * 1 * 9 + 3.0 * 2 * 11          // t(t-1)(2t+5) for t=2 and t=3
    assert(rp.getAs[Double]("var_s") == (5.0 * 4 * 15 - vt) / 18.0)
  }

  test("mannKendallTrendBy: grouped equals solo per key on coinciding spines") {
    val rows =
      (1 to 5).flatMap(d => Seq.fill(d)(("up", tsAt(d)))) ++
      (1 to 5).flatMap(d => Seq.fill(6 - d)(("down", tsAt(d))))
    val df = rows.toDF("k", "ts")
    val grouped = StatTests.mannKendallTrendBy(df, col("k"), col("ts"), 86400L)
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    for (k <- Seq("up", "down")) {
      val solo = StatTests.mannKendallTrend(
        df.filter(col("k") === k).select(col("ts")), col("ts"), 86400L).head()
      assert(grouped(k).getAs[Long]("s_statistic") == solo.getAs[Long]("s_statistic"), k)
      assert(grouped(k).getAs[Double]("var_s") == solo.getAs[Double]("var_s"), k)
      assert(grouped(k).getAs[Double]("z") == solo.getAs[Double]("z"), k)
    }
    assert(grouped("up").getAs[Long]("s_statistic") == 10L)
    assert(grouped("down").getAs[Long]("s_statistic") == -10L)
  }

  test("seasonalMannKendall: a weekday cycle fools plain MK but not the seasonal form") {
    // 28 days (4 full weeks): a strong NON-monotonic weekday level
    // cycle + a small +1/week drift. Levels gap >= 5 > the 3-week max
    // drift, so every cross-weekday pair's sign is set by the CYCLE,
    // not the trend — plain MK drowns (hand-count: within-stratum +42,
    // cross-stratum 4*sum_sign(level pairs) = +12, S = 54 over 378
    // pairs, z ~ 1.05, p ~ 0.3), while every same-weekday stratum is
    // strictly rising (S_g = 6 x 7 strata = 42 over 42 pairs).
    val level = Seq(30, 10, 40, 20, 70, 5, 50)
    val rows = (1 to 28).flatMap { d =>
      val n = level((d - 1) % 7) + (d - 1) / 7
      Seq.fill(n)(Tuple1(tsAt(d)))
    }
    val df = rows.toDF("ts")
    val plain = StatTests.mannKendallTrend(df, col("ts"), 86400L).head()
    assert(plain.getAs[Long]("s_statistic") == 54L)
    assert(plain.getAs[Double]("p_two_sided") > 0.1,
      "the cycle must drown the trend for plain MK")
    val seas = StatTests.seasonalMannKendallTrend(df, col("ts"), 86400L).head()
    assert(seas.getAs[Long]("n_buckets") == 28L)
    assert(seas.getAs[Long]("n_seasons") == 7L)
    assert(seas.getAs[Long]("s_statistic") == 42L)
    // per stratum: n_g = 4, no value ties -> 4*3*13 = 156; 7 strata
    val varS = (7.0 * 156.0) / 18.0
    assert(seas.getAs[Double]("var_s") == varS)
    assert(seas.getAs[Double]("z") == (42.0 - 1.0) / math.sqrt(varS))
    assert(seas.getAs[Double]("p_two_sided") < 1e-4,
      "the stratified test must see the drift")
    // pure cycle, no drift: every stratum is constant -> S = 0 and the
    // tie correction kills the whole variance -> z undefined (NULL)
    val pure = (1 to 28).flatMap { d =>
      Seq.fill(level((d - 1) % 7))(Tuple1(tsAt(d)))
    }.toDF("ts")
    val p0 = StatTests.seasonalMannKendallTrend(pure, col("ts"), 86400L).head()
    assert(p0.getAs[Long]("s_statistic") == 0L)
    assert(p0.getAs[Double]("var_s") == 0.0)
    assert(p0.isNullAt(p0.fieldIndex("z")))
    // empty input: defined one-row shape, not a crash
    val e0 = StatTests.seasonalMannKendallTrend(
      Seq.empty[Tuple1[java.sql.Timestamp]].toDF("ts"), col("ts"), 86400L).head()
    assert(e0.getAs[Long]("n_buckets") == 0L)
    assert(e0.isNullAt(e0.fieldIndex("s_statistic")))
  }

  test("seasonalMannKendallTrendBy: grouped equals solo per key on coinciding spines") {
    val level = Seq(3, 1, 4, 2, 7, 1, 5)
    val rows =
      (1 to 28).flatMap { d =>
        Seq.fill(level((d - 1) % 7) + (d - 1) / 7)(("drift", tsAt(d)))
      } ++
      (1 to 28).flatMap { d => Seq.fill(level((d - 1) % 7))(("cycle", tsAt(d))) }
    val df = rows.toDF("k", "ts")
    val grouped = StatTests.seasonalMannKendallTrendBy(
        df, col("k"), col("ts"), 86400L)
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    for (k <- Seq("drift", "cycle")) {
      val solo = StatTests.seasonalMannKendallTrend(
        df.filter(col("k") === k).select(col("ts")), col("ts"), 86400L).head()
      assert(grouped(k).getAs[Long]("s_statistic") ==
        solo.getAs[Long]("s_statistic"), k)
      assert(grouped(k).getAs[Double]("var_s") == solo.getAs[Double]("var_s"), k)
    }
    assert(grouped("drift").getAs[Long]("s_statistic") == 42L)
    assert(grouped("cycle").getAs[Long]("s_statistic") == 0L)
  }
}
