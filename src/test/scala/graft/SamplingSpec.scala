package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, TestSpark.sf)

  test("splits are disjoint, exhaustive, and reproducible") {
    val split = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.filter($"split".isNull).count() == 0)       // exhaustive
    assert(split.count() == docs.count())                    // no row loss
    val again = Sampling.deterministicSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.exceptAll(again).count() == 0)              // reproducible
    val frac = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(frac("train") > frac("val") && frac("train") > frac("test"))
    assert(math.abs(frac("train") / 500.0 - 0.8) < 0.1)      // ≈ declared fraction
  }

  test("fractions summing to ~1: final bucket is a catch-all, not a float bound") {
    // ten 0.1s accumulate to 0.9999999999999999 < 1.0 — an `s < bound`
    // test on the final bucket would send the top score sliver to
    // split=null (__HIVE_DEFAULT_PARTITION__ in a partitioned sink)
    val ten = (0 until 10).map(i => s"b$i" -> 0.1)
    assert(ten.map(_._2).scanLeft(0.0)(_ + _).last < 1.0)
    val out = Sampling.deterministicSplit(docs, "doc_id", ten)
    assert(out.filter($"split".isNull).count() == 0)
    val rendered = out.queryExecution.analyzed.toString
    assert(rendered.contains("ELSE b9"), // catch-all branch, not a bound compare
      s"final bucket must be the otherwise() branch:\n$rendered")
  }

  test("fractions summing below 1 leave the remainder unlabeled (null)") {
    val out = Sampling.deterministicSplit(docs, "doc_id",
      Seq("a" -> 0.4, "b" -> 0.2))
    val n = out.count()
    val byLabel = out.groupBy("split").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byLabel.keySet.contains(None)) // remainder really is null
    assert(byLabel(Some("a")) + byLabel(Some("b")) + byLabel(None) == n)
    assert(math.abs(byLabel(Some("a")).toDouble / n - 0.4) < 0.1)
  }

  test("deterministicSample is a subset-stable filter") {
    val s20 = Sampling.deterministicSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val s50 = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(s20.subsetOf(s50)) // nested thresholds → nested samples
    assert(s20.nonEmpty && s50.size < 500)
  }

  test("stratified sample downsamples only the targeted stratum") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.2), defaultFraction = 1.0)
    val before = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("en") < before("en") * 0.35)          // en downsampled
    assert(before.filterNot(_._1 == "en").forall {     // others untouched
      case (l, n) => after(l) == n
    })
  }

  test("capPerGroup: exact cap, deterministic winners, payload intact") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val capped = graft.operators.Sampling.capPerGroup(docs, "doc_id", "source", 10)
    val perSource = capped.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.values.forall(_ == 10), s"each source capped at 10: $perSource")
    // ranks are 1..10 within each group
    val ranks = capped.groupBy("source")
      .agg(min("sample_rank"), max("sample_rank")).collect()
    assert(ranks.forall(r => r.getLong(1) == 1L && r.getLong(2) == 10L))
    // deterministic: a second evaluation keeps the identical ids
    val ids1 = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = graft.operators.Sampling.capPerGroup(docs, "doc_id", "source", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // all original columns survive the semi-style join back
    assert(capped.columns.toSet == docs.columns.toSet + "sample_rank")
    // a cap above the group size keeps everything
    assert(graft.operators.Sampling.capPerGroup(docs, "doc_id", "source", 1000)
      .count() == docs.count())
  }

  test("capPerGroupBy keeps the top-k BY SCORE per group; salted == unsalted") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val capped = Sampling.capPerGroupBy(docs, "doc_id", "source", 5, $"n_chars")
    // every kept doc is at least as long as every unkept doc of its source
    val keptMin = capped.groupBy("source").agg(min($"n_chars").as("kmin"))
    val unkeptMax = docs.join(capped.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("source").agg(max($"n_chars").as("umax"))
    val bad = keptMin.join(unkeptMax, "source").filter($"umax" > $"kmin").collect()
    assert(bad.isEmpty, s"an unkept doc outranks a kept one: ${bad.toSeq}")
    assert(capped.groupBy("source").count().collect().forall(_.getLong(1) == 5))
    // exactness of the salted two-phase under the explicit score order
    def ids(salts: Int) = Sampling.capPerGroupBy(docs, "doc_id", "source", 5,
      $"n_chars", salts = salts).select("doc_id", "sample_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids(1) == ids(32))
  }

  test("splitting on the group column is leakage-safe: a source never straddles splits") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val split = Sampling.deterministicSplit(docs, "source",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val perSource = split.groupBy("source")
      .agg(countDistinct($"split").as("n_splits")).collect()
    assert(perSource.forall(_.getLong(1) == 1L),
      "every document of a source must land in exactly one split")
    assert(split.select("split").distinct().count() > 1,
      "groups spread across multiple splits")
  }

  test("packBySizeBudget: bounded packs, dense layout, deterministic, lossless") {
    import graft.operators.Packing
    val docs = Tables.documents(spark, TestSpark.sf)
    val budget = 4000L
    val packed = Packing.packBySizeBudget(docs, "doc_id", "n_chars", budget, shards = 8)
    assert(packed.count() == docs.count(), "packing loses no rows")
    val packs = Packing.packSummary(docs, "doc_id", "n_chars", budget, shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the streaming first-fit bound: a pack exceeds the budget only by
    // part of its single straddling document
    val maxDoc = docs.agg(max($"n_chars")).head().getLong(0)
    assert(packs.forall(_._4 < budget + maxDoc),
      s"pack totals must stay under budget+maxDoc: ${packs.filter(_._4 >= budget + maxDoc).toSeq}")
    // dense: a non-final pack can fall short of the budget only by the
    // previous pack's overshoot, which is bounded by one document —
    // so every non-final pack totals > budget − maxDoc
    val lastPack = packs.groupBy(_._1).map { case (s, ps) => s -> ps.map(_._2).max }
    val sparse = packs.filter(p => p._4 <= budget - maxDoc && lastPack(p._1) != p._2)
    assert(sparse.isEmpty, s"non-final packs must be budget-dense: ${sparse.toSeq}")
    // in-pack positions are 1..n_docs
    val pos = packed.groupBy("shard", "pack_id")
      .agg(min($"pack_pos").as("lo"), max($"pack_pos").as("hi"), count(lit(1)).as("n"))
      .collect()
    assert(pos.forall(r => r.getLong(2) == 1L && r.getLong(3) == r.getLong(4)))
    // deterministic across evaluations
    val again = Packing.packBySizeBudget(docs, "doc_id", "n_chars", budget, shards = 8)
      .select("doc_id", "shard", "pack_id", "pack_pos")
    assert(packed.select("doc_id", "shard", "pack_id", "pack_pos")
      .exceptAll(again).count() == 0)
  }

  test("capPerGroup: salted two-phase result equals the single-window result on a skewed fixture") {
    // one Zipfian-hot group (80% of rows) plus a tail of small groups —
    // the shape the salting exists for. salts=1 degenerates to the
    // single-window plan; any salts value must keep the identical set,
    // because the global per-group top-k under the (score, id) total
    // order is contained in the union of per-salt top-k sets.
    val skewed = spark.range(0, 5000).toDF("doc_id")
      .withColumn("grp",
        when($"doc_id" < 4000, lit("hot")).otherwise(concat(lit("g"), $"doc_id" % 10)))
    def keptRanks(salts: Int) =
      Sampling.capPerGroup(skewed, "doc_id", "grp", 7, salts = salts)
        .select("doc_id", "grp", "sample_rank")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val unsalted = keptRanks(1)
    assert(keptRanks(32) == unsalted)
    assert(keptRanks(5) == unsalted) // salts ∤ group sizes: still exact
    assert(unsalted.count(_._2 == "hot") == 7)
  }

  test("prioritySample: exact weighted top-k, salted == unsalted, zero-weight rows excluded") {
    val k = 25
    val out = Sampling.prioritySample(docs, "doc_id", col("n_chars"), k)
    assert(out.count() == k)
    // salted two-phase == degenerate single-window plan (containment
    // argument over the priority-desc total order)
    val ref = Sampling.prioritySample(docs, "doc_id", col("n_chars"), k, salts = 1)
      .select("doc_id", "priority_rank")
    assert(out.select("doc_id", "priority_rank").exceptAll(ref).count() == 0)
    // length-proportional inclusion: winners are longer than average
    val avgAll = docs.agg(avg($"n_chars")).head.getDouble(0)
    val avgWin = out.agg(avg($"n_chars")).head.getDouble(0)
    assert(avgWin > avgAll,
      s"priority winners avg $avgWin should exceed corpus avg $avgAll")
    // rows with weight ≤ 0 carry no mass and never win
    val zeroed = docs.withColumn("w2",
      when($"doc_id" % 2 === 0, lit(0L)).otherwise($"n_chars"))
    val oddOnly = Sampling.prioritySample(zeroed, "doc_id", col("w2"), k)
    assert(oddOnly.filter($"doc_id" % 2 === 0).count() == 0)
    assert(oddOnly.count() == k)
  }

  test("mixToBudget: kept counts track target weights; unlisted groups dropped; reproducible") {
    val weights = Map("src1" -> 0.5, "src2" -> 0.3, "src4" -> 0.2)
    val out = Sampling.mixToBudget(docs, "doc_id", "source", weights, budget = 60L)
    val by = out.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by.keySet.subsetOf(weights.keySet)) // unlisted sources dropped
    // src1 target 60·0.5 = 30 > the 25 available → fraction capped at 1,
    // everything kept, shortfall visible rather than reassigned
    assert(by("src1") == 25)
    // partial keeps land near their binomial mean (n=25, p=.72/.48)
    assert(by("src2") >= 12 && by("src2") < 25)
    assert(by("src4") >= 5 && by("src4") < 20)
    // deterministic: same rows every run
    val again = Sampling.mixToBudget(docs, "doc_id", "source", weights, budget = 60L)
    assert(out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0)
    // keep_fraction is reported per row and constant within a group
    assert(out.select("source", "keep_fraction").distinct().count() == by.size)
  }

  test("deterministicShuffle: a reproducible seeded permutation; seeds decorrelate; no global sort") {
    import org.apache.spark.sql.functions._
    val df = (1 to 500).map(i => (i.toLong, s"doc$i")).toDF("id", "text")
    def order(seed: Long): Seq[Long] = {
      val shuffled = Sampling.deterministicShuffle(df, "id", seed, 8)
      // read partitions in index order = the full permutation
      shuffled.select($"id").rdd
        .mapPartitionsWithIndex { case (p, it) => it.map(r => (p, r.getLong(0))) }
        .collect().sortBy(_._1).map(_._2).toSeq
    }
    val e0 = order(seed = 0); val e0again = order(seed = 0); val e1 = order(seed = 1)
    assert(e0 == e0again)                       // same epoch reproduces exactly
    assert(e0.sorted == (1L to 500L) && e1.sorted == (1L to 500L)) // permutations
    assert(e0 != e1)                            // epochs decorrelate
    assert(e0 != (1L to 500L))                  // and it actually shuffles
    // plan shape: range repartition + per-partition sort, never a
    // single-partition global Sort
    val plan = Sampling.deterministicShuffle(df, "id", 0, 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(plan.contains("Sort ") && plan.contains("false, 0"), plan) // global=false
  }

  test("sampleToBudget: exact prefix of the hash order, bucketed == global reference") {
    import graft.operators.Sampling
    val df = (1L to 300L).map(i => (i, 10L + i % 7)).toDF("id", "w")
    val budget = 900L
    // driver-side reference: sort by the SAME score, scan until the
    // running total before a row reaches the budget
    val scored = df
      .withColumn("_s", Sampling.hashScore($"id"))
      .select($"id", $"w", $"_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy { case (id, _, s) => (s, id) }
    var cum = 0L
    val expected = scored.takeWhile { case (_, w, _) =>
      val keep = cum < budget; cum += w; keep
    }.map(_._1).toSet
    // few buckets → the boundary window path is genuinely exercised
    for (buckets <- Seq(1, 4, 4096)) {
      val kept = Sampling.sampleToBudget(df, "id", $"w", budget, buckets)
        .select("id").as[Long].collect().toSet
      assert(kept == expected,
        s"buckets=$buckets must reproduce the global prefix (got ${kept.size}, want ${expected.size})")
    }
    // degenerate budgets
    assert(Sampling.sampleToBudget(df, "id", $"w", 0L).count() == 0)
    val all = Sampling.sampleToBudget(df, "id", $"w", Long.MaxValue).count()
    assert(all == 300L, "a budget beyond the corpus keeps everything")
  }

  test("splitLeakage: straddling groups counted exactly; group-keyed split audits clean") {
    val rows = Seq(
      // group A: 3 rows across train+test → leaks (3 rows)
      (1L, "A", "train"), (2L, "A", "train"), (3L, "A", "test"),
      // group B: 2 rows, same split → multi-row but clean
      (4L, "B", "test"), (5L, "B", "test"),
      // group C: singleton → can't leak
      (6L, "C", "train"),
      // group D: one real split + one unassigned row → NOT leakage
      (7L, "D", "train"), (8L, "D", null))
      .toDF("id", "g", "split")
    val r = Sampling.splitLeakage(rows, $"g", $"split").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((4L, 3L, 1L, 3L)),
      "expected 4 groups, 3 multi-row, 1 leaking, 3 leaking rows")
    val offenders = Sampling.splitLeakageGroups(rows, $"g", $"split")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(offenders.toSeq == Seq(("A", 3L, 2L)))
    // the leakage-safe recipe: split keyed on the GROUP column
    // assigns whole groups — the audit reads zero by construction
    val grouped = Sampling.deterministicSplit(
      rows.drop("split"), "g", Seq("train" -> 0.5, "test" -> 0.5))
    val clean = Sampling.splitLeakage(grouped, $"g", $"split").head()
    assert(clean.getLong(2) == 0L && clean.getLong(3) == 0L,
      "a group-keyed split must never leak")
  }

  test("mixtureSchedule: dense per-source ranks, weight-proportional prefixes, null source scheduled") {
    import org.apache.spark.sql.functions.col
    val df = (1 to 300).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "src")
    val sched = Sampling.mixtureSchedule(
      df, "id", "src", Map("s0" -> 2.0), defaultWeight = 1.0, cells = 16)
    val rows = sched.orderBy(col("sched_pos"), col("id")).collect()
    assert(rows.length == 300)
    // ranks are a dense 0-based permutation inside every source
    rows.groupBy(_.getString(1)).foreach { case (s, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (0L until rs.length).toSeq,
        s"ranks of $s must be dense from 0")
    }
    // stride rule: position of source-rank i at weight w is (i+0.5)/w
    rows.foreach { r =>
      val w = if (r.getString(1) == "s0") 2.0 else 1.0
      assert(r.getDouble(3) == (r.getLong(2) + 0.5) / w)
    }
    // the prefix up to schedule position 30 holds 60 of s0 (2x density)
    // and 30 each of s1/s2 — the whole point of the interleave
    val prefix = rows.filter(_.getDouble(3) < 30.0).map(_.getString(1))
    assert(prefix.count(_ == "s0") == 60)
    assert(prefix.count(_ == "s1") == 30 && prefix.count(_ == "s2") == 30)
    // reproducible: a second computation yields the identical schedule
    val again = Sampling.mixtureSchedule(
        df, "id", "src", Map("s0" -> 2.0), defaultWeight = 1.0, cells = 16)
      .orderBy(col("sched_pos"), col("id")).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // null source: its own group at defaultWeight, never dropped
    val withNull = Seq((1L, Some("a")), (2L, None), (3L, None)).toDF("id", "src")
    val ns = Sampling.mixtureSchedule(
        withNull, "id", "src", Map.empty, defaultWeight = 1.0, cells = 4)
      .filter(col("src").isNull).collect()
    assert(ns.length == 2 && ns.map(_.getLong(2)).sorted.toSeq == Seq(0L, 1L))
  }

  // ---------------- clusterSafeSplit ----------------

  test("clusterSafeSplit: every cluster lands whole in one split — zero leakage by construction") {
    // 60 docs; docs 0..29 pair up into 10 clusters of 3 (cluster id = min member)
    val rows = (0L until 60L).map(i => Tuple1(i)).toDF("doc_id")
    val clusters = (0L until 30L).map(i => (i, i % 10)).toDF("doc_id", "cluster_id")
    val out = Sampling.clusterSafeSplit(rows, "doc_id",
      clusters, "doc_id", "cluster_id", Seq("train" -> 0.5, "test" -> 0.5))
    assert(out.count() == 60L)
    // audit on the representative key: zero leaking groups
    val keyed = out.join(clusters, Seq("doc_id"), "left")
      .withColumn("g", coalesce(col("cluster_id"), col("doc_id")))
    val audit = Sampling.splitLeakage(keyed, col("g"), col("split")).head()
    assert(audit.getAs[Long]("n_leaking_groups") == 0L)
    assert(audit.getAs[Long]("n_multi_row_groups") == 10L)
    // all three members of each cluster share the split
    val perCluster = keyed.filter(col("cluster_id").isNotNull)
      .groupBy("cluster_id").agg(count_distinct(col("split")).as("k")).collect()
    assert(perCluster.length == 10 && perCluster.forall(_.getAs[Long]("k") == 1L))
  }

  test("clusterSafeSplit: singletons split exactly as deterministicSplit on their own id") {
    val rows = (100L until 160L).map(i => Tuple1(i)).toDF("doc_id")
    val noClusters = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    val a = Sampling.clusterSafeSplit(rows, "doc_id",
        noClusters, "doc_id", "cluster_id", Seq("train" -> 0.8, "test" -> 0.2))
      .select("doc_id", "split").orderBy("doc_id").collect().toSeq
    val b = Sampling.deterministicSplit(rows, "doc_id",
        Seq("train" -> 0.8, "test" -> 0.2))
      .select("doc_id", "split").orderBy("doc_id").collect().toSeq
    assert(a == b)
    // a clustered doc follows its REPRESENTATIVE's hash, not its own
    val one = Seq((150L, 101L)).toDF("doc_id", "cluster_id")
    val moved = Sampling.clusterSafeSplit(rows, "doc_id",
        one, "doc_id", "cluster_id", Seq("train" -> 0.8, "test" -> 0.2))
      .filter(col("doc_id") === 150L || col("doc_id") === 101L)
      .select("split").distinct().count()
    assert(moved == 1L, "doc 150 must share doc 101's split")
  }

  test("temperatureMixturePlan: hand-computed sqrt flattening, exact IEEE shares, exclusions") {
    // tokens 100/400/2500 -> sqrt 10/20/50 -> quantized 1e10/2e10/5e10
    // (exact powers sum to 8e10, so every share below is an exact
    // binary fraction: 0.125 / 0.25 / 0.625); budget 800 -> targets
    // 100/200/500 -> epochs 1.0 / 0.5 / 0.2
    val rows: Seq[(String, java.lang.Long)] = Seq(
      ("a", 60L), ("a", 40L),
      ("b", 400L),
      ("c", 1000L), ("c", 1500L),
      (null, 999L),                        // null source: excluded
      ("c", null))                         // null tokens: excluded
    val df = rows.toDF("src", "tk")
    val out = Sampling.temperatureMixturePlan(df, col("src"), col("tk"), 800L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "c"))
    assert(out("a").getAs[Long]("n_docs") == 2L)
    assert(out("a").getAs[Long]("total_tokens") == 100L)
    assert(out("a").getAs[Double]("token_share") == 100.0 / 3000.0)
    assert(out("a").getAs[Double]("temp_weight") == 0.125)
    assert(out("b").getAs[Double]("temp_weight") == 0.25)
    assert(out("c").getAs[Double]("temp_weight") == 0.625)
    assert(out("a").getAs[Double]("target_tokens") == 100.0)
    assert(out("a").getAs[Double]("epochs") == 1.0)
    assert(out("b").getAs[Double]("epochs") == 0.5)
    assert(out("c").getAs[Double]("epochs") == 0.2)
    // temperature flattens: the small source's weight share exceeds
    // its raw token share, the big one's shrinks
    assert(out("a").getAs[Double]("temp_weight") >
      out("a").getAs[Double]("token_share"))
    assert(out("c").getAs[Double]("temp_weight") <
      out("c").getAs[Double]("token_share"))
  }
}
