package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.Curation.{CurationConfig, CurationReport}

/** End-to-end curation over the corpus: the funnel must be monotone,
  * each stage must actually remove what it claims, and the sink must
  * land split-partitioned with counts matching the report.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("curate: monotone funnel, dedup removes known duplicates, partitioned sink") {
    val out = Files.createTempDirectory("curation").toString + "/corpus"
    val docs = Tables.documents(spark, TestSpark.sf)
    val r: CurationReport = Curation.curate(
      spark, docs, "doc_id", "text", out, CurationConfig())

    assert(r.input == docs.count())
    assert(r.afterQuality <= r.input)
    assert(r.afterLanguage <= r.afterQuality)
    assert(r.afterExactDedup <= r.afterLanguage,
      "exact dedup can only remove (this corpus has no exact dups — q10 shows 1 group per doc)")
    assert(r.afterNearDedup < r.afterExactDedup,
      "the corpus plants near-duplicates (q11/q12) — some must drop")
    assert(r.afterDecontamination == r.afterNearDedup,
      "no benchmark supplied: the decontamination stage is skipped, counts pass through")
    assert(r.splits.values.sum == r.afterNearDedup,
      "splits partition the survivors exactly")
    assert(r.splits.keySet == Set("train", "val", "test"))
    assert(r.splits("train") > r.splits("val"))

    // the sink is physically partitioned by split
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("split="))
    assert(dirs.toSet == Set("split=train", "split=val", "split=test"))

    // survivors are exactly-unique by content
    val kept = spark.read.parquet(out)
    assert(kept.groupBy("text").count().filter($"count" > 1).count() == 0)
  }

  test("extraRules fold into the quality gate: rule-violating docs never reach the corpus") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("curation_rules").toString + "/corpus"
    val docs = Tables.documents(spark, TestSpark.sf)
    val rule = graft.operators.Checks.ValidationRule(
      "source_blocklist", col("source") =!= "src0")
    val r = Curation.curate(spark, docs, "doc_id", "text", out,
      CurationConfig(extraRules = Seq(rule)))
    val rBase = Curation.curate(spark, docs, "doc_id", "text",
      Files.createTempDirectory("curation_norules").toString + "/corpus",
      CurationConfig())
    assert(r.afterQuality < rBase.afterQuality,
      "the corpus has src0 docs — the rule must reject some")
    val kept = spark.read.parquet(out)
    assert(kept.filter(col("source") === "src0").count() == 0)
  }

  test("cluster-canonical near-dedup keeps one doc per component, at most greedy's count") {
    val outG = Files.createTempDirectory("curation_greedy").toString + "/corpus"
    val outC = Files.createTempDirectory("curation_cluster").toString + "/corpus"
    val docs = Tables.documents(spark, TestSpark.sf)
    val greedy = Curation.curate(spark, docs, "doc_id", "text", outG, CurationConfig())
    val cluster = Curation.curate(spark, docs, "doc_id", "text", outC,
      CurationConfig(clusterNearDups = true))
    // same funnel up to near-dedup; cluster policy can only drop MORE
    assert(cluster.afterExactDedup == greedy.afterExactDedup)
    assert(cluster.afterNearDedup <= greedy.afterNearDedup)
    assert(cluster.afterNearDedup < cluster.afterExactDedup)
    // exactly one survivor per near-dup component: re-running the LSH
    // pair search over the kept docs must find no pair at all
    val kept = spark.read.parquet(outC).select($"doc_id", $"text")
    val residual = graft.operators.Dedup.lshNearDupPairs(
      kept, "doc_id", "text", n = 3, numHashes = 64, bands = 16, threshold = 0.8)
    assert(residual.count() == 0,
      "cluster-canonical survivors must contain no near-dup pair")
  }

  test("canonicalBy keeps the highest-quality cluster member, not the min id") {
    import org.apache.spark.sql.functions.{col, length}
    val out = Files.createTempDirectory("curation_canon").toString + "/corpus"
    val base = "the quick brown fox jumps over the lazy dog while the calm river " +
      "flows past the old stone bridge and the quiet village sleeps under " +
      "a wide summer sky full of slow white clouds drifting toward the hills"
    val docs = Seq(
      1L -> base,                                  // min id, SHORTER member
      2L -> (base + " and far beyond them"),       // near-dup of 1, longer
      9L -> ("a completely different report about " +
        "steel production quotas in the northern " +
        "factories during the long cold winter months of the planning year"))
      .toDF("doc_id", "text")
    // default policy: min id survives
    val rMin = Curation.curate(spark, docs, "doc_id", "text",
      Files.createTempDirectory("curation_min").toString + "/corpus",
      CurationConfig(clusterNearDups = true))
    assert(rMin.afterNearDedup == 2)
    // quality-aware policy: the LONGEST member survives instead
    val rQ = Curation.curate(spark, docs, "doc_id", "text", out,
      CurationConfig(clusterNearDups = true, canonicalBy = Some(length(col("text")))))
    assert(rQ.afterNearDedup == 2)
    val kept = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 9L),
      s"doc 2 (longest in its cluster) must be the canonical, got $kept")
  }

  test("curate with a benchmark: contaminated docs drop, report counts the stage") {
    val out = Files.createTempDirectory("curation_decontam").toString + "/corpus"
    val docs = Tables.documents(spark, TestSpark.sf)
    // use a slice of the corpus itself as the "benchmark": every
    // surviving doc sharing an 8-gram with it must disappear
    val bench = docs.filter($"doc_id" % 10 === 0)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val r = Curation.curate(
      spark, corpus, "doc_id", "text", out, CurationConfig(),
      benchmark = Some(bench))
    assert(r.afterDecontamination <= r.afterNearDedup)
    assert(r.splits.values.sum == r.afterDecontamination,
      "splits partition the decontaminated survivors exactly")
    // nothing written overlaps the benchmark at the configured n-gram
    val keptDocs = spark.read.parquet(out)
    val overlap = graft.operators.Decontamination
      .contaminationReport(keptDocs, bench, "doc_id", "text", n = 8)
    assert(overlap.count() == 0, "sink must be clean of benchmark n-grams")

    // the bloom-prefiltered plan keeps the identical funnel counts
    val outBloom = Files.createTempDirectory("curation_bloom").toString + "/corpus"
    val rBloom = Curation.curate(
      spark, corpus, "doc_id", "text", outBloom,
      CurationConfig(decontamBloom = true),
      benchmark = Some(bench))
    assert(rBloom.afterDecontamination == r.afterDecontamination &&
      rBloom.splits == r.splits,
      "bloom decontamination must keep exactly the broadcast path's survivors")
  }

  test("splitByCluster: surviving near-dup relatives never straddle train/test") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("curation_csplit").toString + "/corpus"
    val docs = Tables.documents(spark, TestSpark.sf)
    // default pairwise-greedy dedup: several members of one near-dup
    // family can survive — the configuration where a row-hashed split
    // can leak and the cluster-keyed split must not
    val cfg = CurationConfig(splitByCluster = true)
    val r = Curation.curate(spark, docs, "doc_id", "text", out, cfg)
    assert(r.splits.values.sum == r.afterNearDedup)
    val kept = spark.read.parquet(out)
    // re-mine near-dup pairs among the SURVIVORS: each pair must share
    // a split (its two sides are in one cluster of the original graph)
    val pairs = graft.operators.Dedup.lshNearDupPairs(
      kept, "doc_id", "text", cfg.shingleN, cfg.minhashHashes,
      cfg.minhashBands, cfg.nearDupThreshold)
    val sides = kept.select($"doc_id", $"split")
    val straddling = pairs
      .join(sides.select($"doc_id".as("id_a"), $"split".as("_sa")), "id_a")
      .join(sides.select($"doc_id".as("id_b"), $"split".as("_sb")), "id_b")
      .filter($"_sa" =!= $"_sb")
    assert(straddling.count() == 0,
      "cluster-keyed split must put surviving near-dup relatives in one split")
  }
}
