package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.functions.DqFunctions._
import graft.operators.Reconciliation

/** Property-based pins (SURVEY.md §5.2 item 3). Spark round-trips are
  * expensive per case, so properties run on small generated batches:
  * one DataFrame per property, many rows per DataFrame.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("horizontal stddev equals stddev_samp of exploded rows for random null patterns") {
    val rowGen = Gen.listOfN(3, Gen.option(Gen.choose(-1e6, 1e6)))
    val rows = Gen.listOfN(60, rowGen).sample.get
      .map { case List(a, b, c) => (a, b, c) }
    val df = rows.toDF("a", "b", "c").withColumn("id", monotonically_increasing_id())
    val horiz = df.select($"id", horizontalStddevSamp($"a", $"b", $"c").as("h"))
    val long = df.select($"id", explode(array($"a", $"b", $"c")).as("v"))
      .filter($"v".isNotNull)
      .groupBy("id").agg(stddev_samp($"v").as("s"))
    val joined = horiz.join(long, Seq("id"), "left").collect()
    joined.foreach { r =>
      val h = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      val s = if (r.size < 3 || r.isNullAt(2)) None else Some(r.getDouble(2))
      (h, s) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-6 * math.max(1, math.abs(y)))
        case (None, None) => ()
        case (None, Some(y)) => assert(y.isNaN || false, s"horiz null but samp $y")
        case (Some(x), None) => fail(s"horiz $x but samp null")
      }
    }
  }

  test("union fan-out count is the sum of per-source counts") {
    val sizes = Gen.listOfN(5, Gen.choose(0, 50)).sample.get
    val frames = sizes.zipWithIndex.map { case (n, i) =>
      (0 until n).map(j => (i, j)).toDF("src", "v")
    }
    val nonEmptyTotal = sizes.sum
    val unioned = frames.reduce(_ unionByName _)
    assert(unioned.count() == nonEmptyTotal)
  }

  test("reconciliation variance is antisymmetric under source/dest swap") {
    val entries = Gen.listOfN(20,
      Gen.zip(Gen.choose(0, 5), Gen.oneOf("a", "b"), Gen.choose(0L, 100L)))
      .sample.get.distinctBy(e => (e._1, e._2))
    val (left, right) = entries.splitAt(entries.size / 2)
    def df(rows: Seq[(Int, String, Long)]) =
      rows.toDF("site_id", "table_name", "record_count")
    val ab = Reconciliation.reconcile(df(left), df(right), current_date())
      .select($"site_id", $"table_name", $"variance")
    val ba = Reconciliation.reconcile(df(right), df(left), current_date())
      .select($"site_id", $"table_name", (-$"variance").as("variance"))
    assert(ab.exceptAll(ba).count() == 0 && ba.exceptAll(ab).count() == 0)
  }

  test("pivot-max round-trips: unpivoting the wide frame recovers the long frame") {
    val rows = Gen.listOfN(30,
      Gen.zip(Gen.choose(0, 6), Gen.oneOf("t1", "t2", "t3"), Gen.choose(0, 3000)))
      .sample.get.distinctBy(e => (e._1, e._2))
      .map { case (f, t, days) => (f, t, java.sql.Date.valueOf(
        java.time.LocalDate.of(2020, 1, 1).plusDays(days))) }
    val long = rows.toDF("facility_id", "table_name", "max_date")
    val wide = graft.operators.Freshness.pivotMaxDates(
      long, Seq("facility_id"), Seq("t1", "t2", "t3"))
    val back = wide.select($"facility_id", explode(array(Seq("t1", "t2", "t3").map(t =>
        struct(lit(t).as("table_name"), col(s"${t}_max_date").as("max_date"))): _*)).as("u"))
      .select($"facility_id", $"u.table_name", $"u.max_date")
      .filter($"max_date".isNotNull)
    assert(back.exceptAll(long).count() == 0 && long.exceptAll(back).count() == 0)
  }

  test("minhash agreement tracks true jaccard (correlation on random doc pairs)") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val docGen = Gen.chooseNum(8, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val docs = Gen.listOfN(30, docGen).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val exact = graft.operators.Dedup
      .ngramJaccardPairs(df, "doc_id", "text", 3, 0.0)
      .withColumnRenamed("jaccard", "true_j")
    val sigs = graft.operators.Dedup.minhashSignatures(df, "doc_id", "text", 3, 128)
    val est = sigs.as("a").join(sigs.as("b"), $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        minhashAgreement($"a.sig", $"b.sig").as("est_j"))
    val pairs = exact.join(est, Seq("id_a", "id_b"))
      .select("true_j", "est_j").as[(Double, Double)].collect()
    assert(pairs.nonEmpty)
    // 128 hashes → stderr ≈ sqrt(j(1-j)/128) ≤ 0.045; allow 5 sigma
    pairs.foreach { case (t, e) => assert(math.abs(t - e) < 0.25, s"true=$t est=$e") }
  }

  test("minAgreeingBands floor is pigeonhole-sound for random signature pairs") {
    // brute-force check of the combinatorial claim behind the LSH
    // prefilter: ANY pair with componentwise agreement ≥ t fully
    // agrees on at least the floor's number of bands
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val bands = Seq(4, 8, 16, 32)(rng.nextInt(4))
      val rows = Seq(1, 2, 4)(rng.nextInt(3))
      val h = bands * rows
      val t = 0.5 + rng.nextDouble() * 0.5
      val floor = graft.operators.Dedup.minAgreeingBands(h, bands, t)
      val a = Array.fill(h)(rng.nextInt(1000))
      val b = a.clone()
      // flip exactly the number of components allowed at agreement t
      val flips = h - math.ceil(t * h - 1e-9).toInt
      rng.shuffle((0 until h).toList).take(flips).foreach(i => b(i) = a(i) + 1000)
      val agreeing = (0 until bands).count { bb =>
        (bb * rows until (bb + 1) * rows).forall(i => a(i) == b(i))
      }
      // the floor's contract is relative to the LSH CANDIDATE set: a
      // pair with zero agreeing bands is invisible to banding anyway,
      // so the clamp to 1 loses nothing vs lshCandidatePairs. Every
      // qualifying pair that IS a candidate must clear the floor.
      assert(agreeing >= floor || (agreeing == 0 && floor == 1),
        s"h=$h bands=$bands t=$t flips=$flips: $agreeing bands agree, floor $floor")
    }
  }

  test("binned range join equals the naive non-equi join on random intervals") {
    import graft.operators.RangeJoin
    val rng = new scala.util.Random(11)
    val points = (1 to 150).map(i => (i.toLong, rng.nextLong() % 10000)).toDF("pid", "pt")
    val intervals = (1 to 40).map { i =>
      val s = rng.nextLong() % 10000
      (i.toLong, s, s + rng.nextInt(500))
    }.toDF("iid", "s", "e")
    for (w <- Seq(7L, 100L, 1000L)) {
      val binned = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val naive = points.join(intervals, col("s") <= col("pt") && col("pt") <= col("e"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(binned === naive, s"binWidth=$w: match sets differ")
    }
  }
}
