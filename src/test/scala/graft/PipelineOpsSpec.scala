package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Decontamination, Redaction, Similarity}

/** Round-3 pipeline operators: decontamination, PII redaction, batch
  * ANN join.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------
  // Decontamination
  // ---------------------------------------------------------------

  private val benchDocs = Seq(
    (100L, "the quick brown fox jumps over the lazy dog tonight")).toDF("id", "text")

  test("decontamination flags exact n-gram overlap and counts distinct shared shingles") {
    val corpus = Seq(
      // shares the full 10-token benchmark text → many 4-grams
      (1L, "prefix words the quick brown fox jumps over the lazy dog tonight suffix"),
      // shares exactly one 4-gram window
      (2L, "xx yy quick brown fox jumps zz ww vv uu"),
      // no 4-gram overlap
      (3L, "completely different content with no shared windows at all here")
    ).toDF("id", "text")
    val report = Decontamination
      .contaminationReport(corpus, benchDocs, "id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(report.contains(1L) && report(1L) >= 7,
      "full containment must share every benchmark window")
    assert(report.get(2L) === Some(1L))
    assert(!report.contains(3L))
  }

  test("decontaminate drops flagged docs; minOverlap raises the bar") {
    val corpus = Seq(
      (1L, "aa the quick brown fox jumps over the lazy dog tonight bb"),
      (2L, "xx yy quick brown fox jumps zz ww vv uu"),
      (3L, "completely different content with no shared windows at all here")
    ).toDF("id", "text")
    val kept1 = Decontamination.decontaminate(corpus, benchDocs, "id", "text", n = 4)
      .select("id").as[Long].collect().toSet
    assert(kept1 === Set(3L))
    val kept2 = Decontamination
      .decontaminate(corpus, benchDocs, "id", "text", n = 4, minOverlap = 2)
      .select("id").as[Long].collect().toSet
    assert(kept2 === Set(2L, 3L), "single-window overlap survives minOverlap=2")
  }

  test("docs shorter than n tokens contribute no shingles") {
    val corpus = Seq((1L, "quick brown fox")).toDF("id", "text")
    assert(Decontamination
      .contaminationReport(corpus, benchDocs, "id", "text", n = 4).count() === 0)
  }

  test("bloom-prefiltered decontamination equals the exact report on a real corpus") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = asMap(Decontamination
      .contaminationReport(corpus, bench, "doc_id", "text", n = 6, minOverlap = 2))
    // a deliberately coarse sketch (high fpp) stresses the exact-confirm
    // stage: false positives must all die at the semi-join
    val bloom = asMap(Decontamination.contaminationReportBloom(
      corpus, bench, "doc_id", "text", n = 6, minOverlap = 2, fpp = 0.5))
    assert(exact.nonEmpty, "fixture must actually contain overlap")
    assert(bloom === exact,
      "bloom prefilter + exact confirm must reproduce the exact report")
  }

  test("bloom decontamination plan confirms with a shuffle join, not a broadcast of the exact set") {
    val docs = Tables.documents(spark, TestSpark.sf).limit(100)
    val out = Decontamination.contaminationReportBloom(
      docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", n = 6)
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("might_contain"),
      s"corpus side must be bloom-prefiltered map-side:\n$physical")
    assert(physical.contains("ShuffledHashJoin") || physical.contains("SortMergeJoin"),
      s"exact confirm must be a shuffle join (the exact set is never broadcast):\n$physical")
  }

  // ---------------------------------------------------------------
  // PII redaction
  // ---------------------------------------------------------------

  test("redactPii replaces all matches per pattern and counts them") {
    val df = Seq(
      (1L, "mail a@b.com and c.d+e@sub.domain.org call 555-123-4567 ssn 123456789"),
      (2L, "clean text, nothing to redact")
    ).toDF("id", "text")
    val out = Redaction.redactPii(df, "id", "text").orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getString(1) === "mail <EMAIL> and <EMAIL> call <PHONE> ssn <ID>")
    assert(r1.getLong(2) === 2L && r1.getLong(3) === 1L && r1.getLong(4) === 1L)
    val r2 = out(1)
    assert(r2.getString(1) === "clean text, nothing to redact")
    assert(r2.getLong(2) === 0L && r2.getLong(3) === 0L && r2.getLong(4) === 0L)
  }

  test("replacement strings are literal even when they contain regex group metacharacters") {
    import graft.operators.Redaction.PiiPattern
    val df = Seq((1L, "amount 1234 end")).toDF("id", "text")
    val out = Redaction.redactPii(df, "id", "text",
      Seq(PiiPattern("amt", "\\d+", "US$0\\x"))).head()
    assert(out.getString(1) === "amount US$0\\x end",
      "a '$0'/backslash in the placeholder must be written verbatim, not expanded")
  }

  test("patterns apply in order: earlier replacements hide text from later rules") {
    // the phone's digits would also match id_number if phone ran later
    val df = Seq((1L, "call 555-123-4567")).toDF("id", "text")
    val out = Redaction.redactPii(df, "id", "text").head()
    assert(out.getString(1) === "call <PHONE>")
    assert(out.getLong(4) === 0L, "id rule must see the already-redacted phone")
  }

  // ---------------------------------------------------------------
  // Provenance / file manifest
  // ---------------------------------------------------------------

  test("fileManifest: one row per physical file, sound min/max envelopes") {
    import graft.operators.Provenance
    val dir = graft.queries.ScaleQueries.ensurePartitionedEvents(spark, TestSpark.sf)
    val df = spark.read.parquet(dir)
    val manifest = Provenance.fileManifest(df, Seq("user_id")).persist()
    val nFiles = manifest.count()
    assert(nFiles > 1, "partitioned layout must yield a multi-file manifest")
    assert(manifest.select("file_path").distinct().count() === nFiles)
    assert(manifest.select("file_name").distinct().count() < nFiles,
      "basenames collide across partition dirs — exactly why the key is the full path")
    assert(manifest.select(sum("n_rows")).as[Long].head() === df.count(),
      "per-file counts must partition the table")
    // envelope soundness: for an arbitrary present user, at least one
    // surviving file really contains it, so a skip-reader loses nothing
    val probe = df.select(min("user_id")).as[Long].head()
    val candidates = Provenance
      .filesPossiblyContaining(manifest, "user_id", lit(probe))
    assert(candidates.count() >= 1 && candidates.count() <= nFiles)
    manifest.unpersist()
  }

  test("takedownPlan: only impacted files appear, hit counts partition the manifest") {
    import graft.operators.Provenance
    val dir = graft.queries.ScaleQueries.ensurePartitionedEvents(spark, TestSpark.sf)
    val df = spark.read.parquet(dir)
    // purge a handful of specific events: every file holding one is
    // in the plan, files without any are not
    val targets = df.select($"event_id").orderBy($"event_id").limit(40)
    val plan = Provenance.takedownPlan(df, "event_id", targets).persist()
    val manifest = Provenance.fileManifest(df, Seq("event_id"))
    assert(plan.count() >= 1 && plan.count() <= manifest.count())
    assert(plan.select(sum($"n_hit")).as[Long].head() === 40L,
      "per-file hits must partition the takedown manifest")
    assert(plan.filter($"n_hit" === 0).count() === 0,
      "untouched files are exactly the ones a rewrite must not touch")
    assert(plan.filter($"hit_fraction" > 1.0).count() === 0)
    // file totals agree with the manifest census for impacted files
    val joined = plan.join(manifest.select($"file_path", $"n_rows".as("m_rows")), "file_path")
    assert(joined.filter($"n_rows" =!= $"m_rows").count() === 0)
    plan.unpersist()
  }

  // ---------------------------------------------------------------
  // Range join
  // ---------------------------------------------------------------

  test("pointInInterval: equals the naive non-equi join, plans as an equi-join") {
    import graft.operators.RangeJoin
    val points = Seq((1L, 5L), (2L, 15L), (3L, 25L), (4L, 100L))
      .toDF("pid", "pt")
    val intervals = Seq((10L, 0L, 20L), (20L, 14L, 30L), (30L, 99L, 99L))
      .toDF("iid", "s", "e")
    val binned = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e",
      binWidth = 7L)
    val naive = points.join(intervals, col("s") <= col("pt") && col("pt") <= col("e"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(pairs(binned) === pairs(naive),
      "banding must reproduce the exact match set, once per pair")
    assert(pairs(binned) === Seq((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L)),
      "inclusive ends; point 4 outside every interval")
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must run as an equi-join on the bin key, got:\n$plan")
  }

  test("pointInInterval: refuses silent bin explosion and inverted intervals at execution") {
    import graft.operators.RangeJoin
    def rootMessages(t: Throwable): String = {
      var cur: Throwable = t; val sb = new StringBuilder
      while (cur != null) { sb.append(Option(cur.getMessage).getOrElse("")); cur = cur.getCause }
      sb.toString
    }
    val points = Seq((1L, 5L)).toDF("pid", "pt")
    val huge = Seq((1L, 0L, Long.MaxValue / 2)).toDF("iid", "s", "e")
    val ex1 = intercept[Exception] {
      RangeJoin.pointInInterval(points, "pt", huge, "s", "e",
        binWidth = 10L, maxBinsPerInterval = 1000L).count()
    }
    assert(rootMessages(ex1).contains("bin explosion refused"),
      "domain-spanning interval must fail loudly in the plan, not wrap Long math")
    val inverted = Seq((1L, 50L, 10L)).toDF("iid", "s", "e")
    val ex2 = intercept[Exception] {
      RangeJoin.pointInInterval(points, "pt", inverted, "s", "e",
        binWidth = 10L).count()
    }
    assert(rootMessages(ex2).contains("inverted"),
      "end < start must fail, not silently generate a descending bin list")
  }

  // ---------------------------------------------------------------
  // CDC snapshot compaction
  // ---------------------------------------------------------------

  test("latestSnapshot: last version wins, tombstone erases the key") {
    import graft.operators.Snapshot
    val log = Seq(
      (1L, 1L, "set", 10.0), (1L, 3L, "set", 30.0), (1L, 2L, "set", 20.0),
      (2L, 1L, "set", 1.0), (2L, 2L, "del", 0.0),
      (3L, 1L, "del", 0.0), (3L, 2L, "set", 5.0)
    ).toDF("key", "version", "op", "v")
    val snap = Snapshot.latestSnapshot(log, Seq("key"),
        Seq(col("version").desc), tombstone = Some(col("op") === "del"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(snap(1L) === (3L, 30.0), "latest version wins regardless of arrival order")
    assert(!snap.contains(2L), "tombstone at head erases the key")
    assert(snap(3L) === (2L, 5.0), "a set after a delete resurrects the key")
  }

  test("latestSnapshot: null tombstone discriminator means NOT deleted") {
    import graft.operators.Snapshot
    val log = Seq(
      (1L, 1L, Option.empty[String], 7.0), // upsert with op = null
      (2L, 1L, Some("del"), 0.0)
    ).toDF("key", "version", "op", "v")
    val snap = Snapshot.latestSnapshot(log, Seq("key"),
        Seq(col("version").desc), tombstone = Some(col("op") === "del"))
      .select("key").as[Long].collect().toSet
    assert(snap === Set(1L), "a null op row must survive; only true tombstones drop")
  }

  // ---------------------------------------------------------------
  // BM25 retrieval
  // ---------------------------------------------------------------

  test("bm25TopK: rarity and term frequency drive the ranking; non-matches score 0") {
    import graft.operators.Retrieval
    val docs = Seq(
      (1L, "alpha beta beta gamma"),     // common term twice
      (2L, "alpha beta gamma delta"),    // both terms once
      (3L, "gamma delta delta epsilon"), // rare term (delta) twice
      (4L, "zeta eta theta iota")        // no query terms
    ).toDF("id", "text")
    val out = Retrieval.bm25TopK(docs, "id", "text", Seq("beta", "epsilon"), k = 4)
      .collect()
    val scores = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // epsilon appears in 1 of 4 docs (idf 4.0), beta in 2 (idf 2.0):
    // doc 3's single rare term beats doc 2's single common term
    assert(scores(3L) > scores(2L), "rarer term must outscore commoner term")
    assert(scores(1L) > scores(2L), "higher tf must outscore lower tf at equal df/len")
    assert(scores(4L) === 0.0)
    // ranked output: scores descending, id ascending on ties
    val ranked = out.map(_.getLong(0)).toSeq
    assert(ranked.head === ranked.maxBy(scores) && scores(ranked.last) === 0.0)
    // tf columns surface per term
    val row1 = out.find(_.getLong(0) == 1L).get
    assert(row1.getLong(2) === 2L && row1.getLong(3) === 0L) // tf_beta, tf_epsilon
  }

  test("bm25TopK: minScore drops zero-score docs; k truncates") {
    import graft.operators.Retrieval
    val docs = Seq(
      (1L, "alpha beta"), (2L, "beta gamma"), (3L, "delta")).toDF("id", "text")
    val hits = Retrieval.bm25TopK(docs, "id", "text", Seq("beta"), k = 10,
        minScore = 1e-12)
      .select("id").as[Long].collect().toSet
    assert(hits === Set(1L, 2L))
    assert(Retrieval.bm25TopK(docs, "id", "text", Seq("beta"), k = 1,
      minScore = 1e-12).count() === 1)
  }

  // ---------------------------------------------------------------
  // Batch ANN join
  // ---------------------------------------------------------------

  test("annJoinBrute: k rows per query, exact ranking, no self matches") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter(col("vec_id") % 20 === 0)
    val corpus = emb.filter(col("vec_id") % 20 =!= 0)
    val nq = queries.count()
    val out = Similarity.annJoinBrute(queries, corpus, "vec_id", "embedding", k = 3)
      .persist()
    assert(out.count() === nq * 3)
    assert(out.groupBy("query_id").count().filter(col("count") =!= 3).count() === 0)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() === 0)
    // spot-check one query against the single-vector brute path
    val qid = queries.select(min("vec_id")).as[Long].head()
    val qv = Similarity.rowVecToDoubles(
      emb.filter(col("vec_id") === qid).select("embedding").head())
    val expected = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", qv, 3)
      .select("id").as[Long].collect().toSeq
    val got = out.filter(col("query_id") === qid)
      .orderBy(col("cosine").desc, col("neighbor_id"))
      .select("neighbor_id").as[Long].collect().toSeq
    assert(got === expected)
    out.unpersist()
  }

  test("annJoinIvf probing every cell equals brute; partial probe keeps recall") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter(col("vec_id") % 20 === 0)
    val corpus = emb.filter(col("vec_id") % 20 =!= 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = pairs(
      Similarity.annJoinBrute(queries, corpus, "vec_id", "embedding", k = 3))
    val full = pairs(Similarity.annJoinIvf(
      queries, corpus, "vec_id", "embedding", k = 3, nlist = 8, nprobe = 8))
    assert(full === brute, "probing all cells must reduce to exact brute force")
    val partial = pairs(Similarity.annJoinIvf(
      queries, corpus, "vec_id", "embedding", k = 3, nlist = 8, nprobe = 4))
    val recall = (partial & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@3 with half the cells probed was $recall")
  }

  test("knnLabelAgreementIvf at full probe equals the brute diagnostic; partial probe stays sane") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val queries = emb.filter(col("vec_id") % 20 === 0)
    val corpus = emb.filter(col("vec_id") % 20 =!= 0)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long, Long)] =
      df.select("label", "n_queries", "n_neighbors", "n_agreeing")
        .as[(String, Long, Long, Long)].collect().toSet
    val brute = rows(Similarity.knnLabelAgreement(
      queries, corpus, "vec_id", "embedding", "label", k = 3))
    // probing every cell scores every (query, corpus) pair the brute
    // path scores — identical ranking tail, identical counts
    val full = rows(Similarity.knnLabelAgreementIvf(
      queries, corpus, "vec_id", "embedding", "label", k = 3,
      nlist = 8, nprobe = 8))
    assert(full === brute, "full probe must reduce to the exact diagnostic")
    // partial probe: same query census (every query still probes
    // SOME cells), neighbor counts bounded by k per query
    val partial = Similarity.knnLabelAgreementIvf(
      queries, corpus, "vec_id", "embedding", "label", k = 3,
      nlist = 8, nprobe = 4)
      .select("label", "n_queries", "n_neighbors", "n_agreeing")
      .as[(String, Long, Long, Long)].collect()
    assert(partial.map(_._2).sum == brute.toSeq.map(_._2).sum,
      "every query must survive probing (it always probes nprobe cells)")
    partial.foreach { case (l, nq, nn, na) =>
      assert(nn <= nq * 3 && na <= nn, s"label $l: inconsistent counts ($nq, $nn, $na)")
    }
  }

  test("dropBoilerplateLines: hot lines vanish, order survives, all-chrome docs stay as rows") {
    import graft.operators.Dedup
    val chrome = "COOKIE BANNER"
    val docs = ((1L to 20L).map(i =>
      (i, s"$chrome\nunique line a $i\nunique line b $i")) :+
      (99L, chrome))                         // a document that is ALL boilerplate
      .toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateLines(docs, "doc_id", "text", maxDocFrequency = 5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.size == 21, "every document keeps its row")
    (1L to 20L).foreach { i =>
      val (txt, kept, dropped) = out(i)
      assert(txt == s"unique line a $i\nunique line b $i", s"doc $i: <$txt>")
      assert(kept == 2 && dropped == 1)
    }
    assert(out(99L) == (("", 0L, 1L)), "all-boilerplate doc -> empty text, not a lost row")
    // below the threshold nothing is touched
    val untouched = Dedup.dropBoilerplateLines(docs, "doc_id", "text", maxDocFrequency = 50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 20L).forall(i => untouched(i) == s"$chrome\nunique line a $i\nunique line b $i"))
  }

  test("compactionPlan: every file grouped once, groups near target, fewer groups than files") {
    import graft.operators.Provenance
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // 12 deliberately small files
    spark.range(0, 12000).selectExpr("id", "repeat('x', 64) AS pad")
      .repartition(12).write.parquet(dir)
    val nFiles = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles == 12)
    val sizes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length())
    val target = sizes.sum / 3 // aim for ~3 groups' worth per shard space
    val plan = Provenance.compactionPlan(spark, dir, target, shards = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(plan.length == nFiles, "every file appears exactly once")
    assert(plan.map(_._1).distinct.length == nFiles)
    val groups = plan.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    assert(groups.size < nFiles, s"compaction must reduce file count: $groups")
    assert(groups.values.forall(_ < target + sizes.max),
      s"each group overflows the target by at most one file: $groups")
  }

  test("compact executes the plan: file count drops, every row survives byte-identically") {
    import graft.operators.Provenance
    val base = java.nio.file.Files.createTempDirectory("compactx").toString
    val dir = base + "/in"
    val outDir = base + "/out"
    spark.range(0, 12000).selectExpr("id", "repeat('y', 64) AS pad")
      .repartition(12).write.parquet(dir)
    def parquetFiles(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val sizes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length())
    val report = Provenance.compact(spark, dir, outDir, sizes.sum / 3, shards = 1)
    assert(report.filesBefore == 12 && report.rowsTotal == 12000L)
    assert(report.nGroups < 12 && report.filesAfter == report.nGroups,
      s"one coalesced file per plan group expected: $report")
    assert(parquetFiles(outDir) == report.nGroups)
    // content identity, not just counts: the per-row hash multiset of
    // every column survives the rewrite exactly
    val h = (d: String) => spark.read.parquet(d)
      .selectExpr("xxhash64(id, pad) AS h").as[Long].collect().sorted.toSeq
    assert(h(outDir) == h(dir))
    // in-place rewrite is refused before touching anything — also
    // through an unnormalized alias of the same directory
    intercept[IllegalArgumentException] {
      Provenance.compact(spark, dir, dir, sizes.sum / 3)
    }
    intercept[IllegalArgumentException] {
      Provenance.compact(spark, dir, dir + "/../" + new java.io.File(dir).getName,
        sizes.sum / 3)
    }
  }

  test("takedownExecute: versioned write-new/verify/swap with a concurrent reader; survivors byte-identical") {
    import graft.operators.Provenance
    def md5(f: java.io.File): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(java.nio.file.Files.readAllBytes(f.toPath))
        .map("%02x".format(_)).mkString
    }
    def parquetFiles(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val base = java.nio.file.Files.createTempDirectory("takedownx").toString
    val v1 = base + "/v1"
    val v2 = base + "/v2"
    // a multi-file corpus: 6 files, ids clustered so SOME files carry
    // no takedown hits at all
    spark.range(0, 6000).selectExpr("id", "repeat('z', 64) AS pad")
      .repartitionByRange(6, $"id").write.parquet(v1)
    assert(parquetFiles(v1).length == 6)
    val v1Sums = parquetFiles(v1).map(f => f.getName -> md5(f)).toMap
    // the version pointer + an IN-FLIGHT reader bound to v1 before the
    // cycle starts (Spark binds the file listing at read creation)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(base, "_CURRENT"), v1)
    val inFlight = spark.read.parquet(
      java.nio.file.Files.readString(java.nio.file.Paths.get(base, "_CURRENT")))
    // take down a contiguous id slice -> it lives in few files
    val ids = spark.range(100, 240).toDF("id")
    val report = Provenance.takedownExecute(spark, v1, v2, "id", ids)
    assert(report.rowsBefore == 6000L && report.rowsDropped == 140L
      && report.rowsAfter == 5860L)
    assert(report.filesCarried + report.filesRewritten == 6L)
    assert(report.filesCarried >= 4L,
      s"a clustered takedown must leave most files untouched: $report")
    // NO overwrite-while-reading: every v1 file is byte-identical
    // after the cycle, and the in-flight reader still sees ALL of v1
    assert(parquetFiles(v1).map(f => f.getName -> md5(f)).toMap == v1Sums,
      "the old version's files must never be touched")
    assert(inFlight.count() == 6000L,
      "a reader bound before the cycle keeps its full version")
    // byte-identical SURVIVORS: each carried file in v2 is an exact
    // byte copy of its v1 original (same name, same md5)
    val v2ByName = parquetFiles(v2).map(f => f.getName -> md5(f)).toMap
    val carriedNames = v2ByName.keySet.intersect(v1Sums.keySet)
    assert(carriedNames.size.toLong == report.filesCarried)
    carriedNames.foreach { n =>
      assert(v2ByName(n) == v1Sums(n), s"carried file $n must be byte-identical")
    }
    // content: v2 == v1 minus exactly the taken-down ids
    val v2Ids = spark.read.parquet(v2).select("id").as[Long].collect().sorted
    val expect = (0L until 6000L).filterNot(i => i >= 100 && i < 240)
    assert(v2Ids.toSeq == expect)
    // the SWAP is a pointer flip: new readers resolve v2, the
    // in-flight reader is unaffected
    java.nio.file.Files.writeString(java.nio.file.Paths.get(base, "_CURRENT"), v2)
    val fresh = spark.read.parquet(
      java.nio.file.Files.readString(java.nio.file.Paths.get(base, "_CURRENT")))
    assert(fresh.count() == 5860L)
    assert(inFlight.count() == 6000L)
    // in-place execution refused, aliases included
    intercept[IllegalArgumentException] {
      Provenance.takedownExecute(spark, v1, v1, "id", ids)
    }
    intercept[IllegalArgumentException] {
      Provenance.takedownExecute(spark, v1,
        v1 + "/../" + new java.io.File(v1).getName, "id", ids)
    }
  }

  test("takedownExecute: Hive-partitioned layout round-trips with partition columns intact") {
    import graft.operators.Provenance
    val base = java.nio.file.Files.createTempDirectory("takedownp").toString
    val v1 = base + "/v1"
    val v2 = base + "/v2"
    // 4 partition dirs; one part file per dir gets the SAME basename
    // (part-00000...), the flat-carry collision the fix pins
    spark.range(0, 4000)
      .selectExpr("id", "CAST(id % 4 AS INT) AS site", "repeat('y', 32) AS pad")
      .repartition(1)
      .write.partitionBy("site").parquet(v1)
    val leafNames = {
      val fs = new java.io.File(v1).listFiles().filter(_.getName.startsWith("site="))
      assert(fs.length == 4)
      fs.flatMap(_.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName))
    }
    assert(leafNames.distinct.length == 1,
      "fixture sanity: all 4 partition dirs must share ONE part-file basename " +
        "(one task writes every partition), or the flat-carry collision this " +
        s"test pins is not being exercised: ${leafNames.toSeq}")
    // hits live in exactly one partition's id range -> other dirs carry
    val ids = spark.range(0, 4000).filter($"id" % 4 === 2 && $"id" < 1000).toDF("id")
    val nHit = ids.count()
    val report = Provenance.takedownExecute(spark, v1, v2, "id", ids)
    assert(report.rowsBefore == 4000L && report.rowsDropped == nHit)
    // the output is STILL a partitioned table: partition column present
    // with every original value, and the per-partition row accounting
    // matches the input minus exactly the taken-down rows
    val after = spark.read.parquet(v2)
    assert(after.columns.toSet == Set("id", "site", "pad"),
      s"partition column lost: ${after.columns.mkString(",")}")
    val perSite = after.groupBy("site").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perSite == Map(0 -> 1000L, 1 -> 1000L, 2 -> (1000L - nHit), 3 -> 1000L))
    // carried dirs are byte-identical copies under their RELATIVE paths
    def md5(f: java.io.File): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(java.nio.file.Files.readAllBytes(f.toPath))
        .map("%02x".format(_)).mkString
    }
    Seq(0, 1, 3).foreach { s =>
      val in = new java.io.File(s"$v1/site=$s").listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      val out = new java.io.File(s"$v2/site=$s").listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      assert(in.map(f => f.getName -> md5(f)).toSeq
        == out.map(f => f.getName -> md5(f)).toSeq,
        s"site=$s must be carried byte-identical under its relative path")
    }
  }

  test("takedownExecute: mixed flat+partitioned layout is refused loudly before any copy") {
    import graft.operators.Provenance
    val base = java.nio.file.Files.createTempDirectory("takedownmix").toString
    val v1 = base + "/v1"
    val v2 = base + "/v2"
    // a partitioned table with a stray flat part file at the root —
    // the layout a botched manual append produces. Single-footer
    // partition inference would silently guess here; the guard must
    // refuse BEFORE any file lands in outDir.
    spark.range(0, 400)
      .selectExpr("id", "CAST(id % 2 AS INT) AS site")
      .write.partitionBy("site").parquet(v1)
    spark.range(400, 500).selectExpr("id", "CAST(0 AS INT) AS site")
      .write.mode("append").parquet(v1 + "_flat")
    // move the flat part file under v1's root
    val flat = new java.io.File(v1 + "_flat").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(flat.toPath,
      java.nio.file.Paths.get(v1, "stray-" + flat.getName))
    val ids = spark.range(0, 10).toDF("id")
    val ex = intercept[IllegalArgumentException] {
      Provenance.takedownExecute(spark, v1, v2, "id", ids)
    }
    assert(ex.getMessage.contains("mixed partition layouts"), ex.getMessage)
    assert(!new java.io.File(v2).exists(),
      "refusal must come before anything is written to outDir")
    // depth-divergent nesting (site=0/extra=1/...) is refused the same way
    val v3 = base + "/v3"
    spark.range(0, 100)
      .selectExpr("id", "CAST(id % 2 AS INT) AS site", "CAST(1 AS INT) AS extra")
      .write.partitionBy("site", "extra").parquet(v3)
    spark.range(100, 120).selectExpr("id", "CAST(9 AS INT) AS site")
      .write.mode("append").parquet(v3 + "_one")
    val one = new java.io.File(v3 + "_one").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val destDir = java.nio.file.Paths.get(v3, "site=9")
    java.nio.file.Files.createDirectories(destDir)
    java.nio.file.Files.move(one.toPath, destDir.resolve(one.getName))
    // here Spark's own partition discovery refuses first (conflicting
    // directory structures at the initial read) — also loud, also
    // before any copy; either refusal satisfies the contract
    val ex2 = intercept[Exception] {
      Provenance.takedownExecute(spark, v3, base + "/v4", "id", ids)
    }
    assert(ex2.getMessage.contains("mixed partition layouts")
      || ex2.getMessage.toLowerCase.contains("conflicting"), ex2.getMessage)
    assert(!new java.io.File(base + "/v4").exists(),
      "refusal must come before anything is written to outDir")
  }

  test("knnLabelAgreement: separable clusters agree fully, shuffled labels don't") {
    // two well-separated clusters on orthogonal axes, 8 vectors each
    def vec(axis: Int, jitter: Double): Seq[Float] =
      Seq.tabulate(4)(i => (if (i == axis) 1.0 else 0.0) + jitter * (i + 1)).map(_.toFloat)
    val rows = (0 until 16).map { i =>
      val axis = i % 2
      (i.toLong, vec(axis, 0.01 * (i / 2)), axis)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val queries = emb.filter($"vec_id" < 2)   // one query per cluster
    val corpus = emb.filter($"vec_id" >= 2)
    val out = Similarity.knnLabelAgreement(
        queries, corpus, "vec_id", "embedding", "label", k = 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // each query's 3 nearest all come from its own cluster
    assert(out == Map(0 -> (1L, 3L, 3L), 1 -> (1L, 3L, 3L)), out.toString)
    // flipping corpus labels breaks agreement completely
    val flipped = Similarity.knnLabelAgreement(queries,
        corpus.withColumn("label", lit(1) - $"label"),
        "vec_id", "embedding", "label", k = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(flipped.values.forall(_ == 0L), flipped.toString)
  }

  test("extractJson: typed fields, malformed and missing-key null-propagation") {
    import graft.operators.SemiStructured
    val df = Seq(
      (1L, """{"k": 7, "tag": "a"}"""),
      (2L, """{"tag": "b"}"""),        // missing k → null
      (3L, """not json at all"""),     // malformed → null struct → nulls
      (4L, null.asInstanceOf[String])  // null payload
    ).toDF("id", "props")
    val out = SemiStructured.extractJson(df, "props", "k INT, tag STRING")
    assert(out.columns.toSeq == Seq("id", "props", "k", "tag"))
    val byId = out.collect().map(r =>
      r.getLong(0) -> (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(byId(1L) == (Some(7), Some("a")))
    assert(byId(2L) == (None, Some("b")))
    assert(byId(3L) == (None, None))
    assert(byId(4L) == (None, None))
    // one parse serves all fields: a single from_json in the analyzed
    // plan (the optimized plan constant-folds this local fixture away)
    val plan = out.queryExecution.analyzed.toString
    assert("from_json".r.findAllIn(plan).length == 1, plan)
    // field/column name collisions fail loudly instead of duplicating
    val e = intercept[IllegalArgumentException] {
      SemiStructured.extractJson(df, "props", "id BIGINT")
    }
    assert(e.getMessage.contains("collide"))
  }

  // ---------------- semantic decontamination ----------------

  test("semanticContaminationReport flags the planted paraphrase, keeps the orthogonal doc") {
    import org.apache.spark.sql.functions._
    val bench = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f))).toDF("id", "vec")
    val corpus = Seq(
      (1L, Array(0.99f, 0.1f, 0.0f)),   // near bench 100 (paraphrase analog)
      (2L, Array(0.0f, 0.0f, 1.0f)),    // orthogonal to the benchmark
      (3L, Array(0.7f, 0.7f, 0.0f))     // between both; best match is min id 100
    ).toDF("id", "vec")
    val rep = graft.operators.Decontamination.semanticContaminationReport(
      corpus, bench, "id", "vec", threshold = 0.9).collect()
    assert(rep.map(_.getLong(0)).toSet == Set(1L))
    assert(rep.head.getAs[Long]("bench_id") == 100L)
    assert(rep.head.getAs[Double]("cosine") > 0.9)
    // tie-ish case at a looser threshold: doc 3 matches both equally,
    // report must pick the smaller bench id deterministically
    val rep2 = graft.operators.Decontamination.semanticContaminationReport(
      corpus, bench, "id", "vec", threshold = 0.5).collect()
    val d3 = rep2.find(_.getLong(0) == 3L).get
    assert(d3.getAs[Long]("bench_id") == 100L)
    val kept = graft.operators.Decontamination.decontaminateSemantic(
      corpus, bench, "id", "vec", threshold = 0.9)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }
}
