package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"),   // near dup
    (3L, "completely unrelated text about spark engines"),
    (4L, "completely unrelated text about spark engines")  // exact dup of 3
  ).toDF("doc_id", "text")

  test("exact duplicate groups and dropExactDuplicates") {
    val groups = Dedup.exactDuplicateGroups(docs, "doc_id", $"text")
    assert(groups.count() == 3) // 3 distinct texts
    val dups = groups.filter($"dup_count" > 1)
      .select("keep_id", "dup_count").as[(Long, Long)].collect().toSet
    assert(dups == Set((0L, 2L), (3L, 2L)))
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", $"text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 3L))
  }

  test("ngram jaccard pairs: exact dups at 1.0, near dup high, unrelated absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((3L, 4L)) == 1.0)
    assert(pairs((0L, 2L)) > 0.7 && pairs((0L, 2L)) < 1.0)
    assert(!pairs.contains((0L, 3L)))
  }

  test("minhash LSH candidates recover planted near-dups on the corpus") {
    val corpus = Tables.documents(spark, TestSpark.sf)
    val exact = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val lsh = Dedup.lshCandidatePairs(corpus, "doc_id", "text", 3, 64, 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // banding with b=8, r=8: s ≥ 0.92 collides w.p. ≥ 1−(1−0.92^8)^8 ≈ 0.97;
    // the planted pairs all sit ≥ 0.92 → expect full recovery
    assert(exact.subsetOf(lsh), s"missing: ${exact -- lsh}")
  }

  test("portable (md5) LSH variants keep the recall property and simhash dup detection") {
    val corpus = Tables.documents(spark, TestSpark.sf)
    val exact = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val lsh = Dedup.lshCandidatePairs(corpus, "doc_id", "text", 3, 64, 8, portable = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(lsh), s"missing: ${exact -- lsh}")
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3, portable = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((3L, 4L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("incremental dedup: new batch deduped against the corpus signature table only") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then sleeps"),
      (2L, "completely different content about distributed query engines"))
      .toDF("doc_id", "text")
    val corpusSigs = Dedup.minhashSignatures(corpus, "doc_id", "text", 3, 64)
    val newBatch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and then sleeps"),  // dup of 1
      (11L, "entirely novel text with no counterpart in the corpus at all"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicatesAgainst(
        corpusSigs, newBatch, "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L), "the corpus duplicate drops, the novel doc survives")
    // new docs are NOT compared among themselves (asymmetric join):
    val twin = Seq(
      (20L, "twin text duplicated within the new batch only right here"),
      (21L, "twin text duplicated within the new batch only right here"))
      .toDF("doc_id", "text")
    val keptTwins = Dedup.dropNearDuplicatesAgainst(
        corpusSigs, twin, "doc_id", "text", threshold = 0.8)
      .count()
    assert(keptTwins == 2, "within-batch dups are the intra-batch pass's job")
    // mismatched signature width fails loudly instead of silently
    // emptying the candidate buckets
    assertThrows[IllegalArgumentException](
      Dedup.dropNearDuplicatesAgainst(
        Dedup.minhashSignatures(corpus, "doc_id", "text", 3, 32),
        newBatch, "doc_id", "text"))
    // the PRE-BANDED spelling (materialized corpus band table — the
    // second between-runs artifact) returns the identical kept set
    val banded = Dedup.bandedSignatures(corpusSigs, 64, 16)
    val (keptPre, sigsPre) = Dedup.dropNearDuplicatesAgainstBanded(
      corpusSigs, banded, newBatch, "doc_id", "text", threshold = 0.8)
    assert(keptPre.select("doc_id").as[Long].collect().toSet == Set(11L))
    sigsPre.unpersist()
    // a band table built at different bands is refused loudly (wrong
    // slice hashes would silently miss pairs)
    assertThrows[IllegalArgumentException](
      Dedup.dropNearDuplicatesAgainstBanded(
        corpusSigs, Dedup.bandedSignatures(corpusSigs, 64, 8),
        newBatch, "doc_id", "text", threshold = 0.8))
  }

  test("broadcast screen: hot-template pair blow-up falls back to the salted path, identical kept set") {
    // The r17 gate bounded the increment-side broadcasts but not the
    // candidate-PAIR set, which scales with increment × corpus
    // collision multiplicity: one hot template duplicated across the
    // corpus turns a small matching increment into corpus-sized pairs
    // — a driver OOM if broadcast. Plant exactly that shape and pin
    // that the screen (a) routes to the salted shuffle path above the
    // pair limit, (b) keeps the identical set either way.
    val template = "the hot boilerplate template that repeats across this entire corpus verbatim"
    val corpus = spark.range(3000)
      .select(col("id").as("doc_id"), lit(template).as("text"))
      .union(spark.range(3000, 3040).select(col("id").as("doc_id"),
        concat(lit("corpus filler row "), col("id"),
          lit(" entirely separate wording here")).as("text")))
    val corpusSigs = Dedup.minhashSignatures(corpus, "doc_id", "text", 3, 64).persist()
    val banded = Dedup.bandedSignatures(corpusSigs, 64, 16)
    val inc = Seq(
      (100000L, template), (100001L, template), (100002L, template), // hot matches
      (100010L, "genuinely novel survivor text with zero counterpart anywhere"),
      (100011L, "another untouched document that must pass the screen intact"))
      .toDF("doc_id", "text")
    // pairs = 3 matching docs × 3000 template copies ≈ 9000 — above a
    // 1k limit (forced fallback), far below the default 4M (broadcast)
    val (keptSalted, s1) = Dedup.dropNearDuplicatesAgainstBanded(
      corpusSigs, banded, inc, "doc_id", "text", threshold = 0.8,
      pairBroadcastLimit = 1000L)
    val saltedPlan = keptSalted.queryExecution.executedPlan.toString
    val saltedSet = keptSalted.select("doc_id").as[Long].collect().toSet
    s1.unpersist()
    val (keptBcast, s2) = Dedup.dropNearDuplicatesAgainstBanded(
      corpusSigs, banded, inc, "doc_id", "text", threshold = 0.8)
    val bcastPlan = keptBcast.queryExecution.executedPlan.toString
    val bcastSet = keptBcast.select("doc_id").as[Long].collect().toSet
    s2.unpersist()
    assert(saltedSet == Set(100010L, 100011L), "template matches drop, novels survive")
    assert(bcastSet == saltedSet, "both routes must keep the identical set")
    assert(saltedPlan.contains("_salt"),
      s"above the pair limit the screen must take the salted shuffle path:\n$saltedPlan")
    assert(!bcastPlan.contains("_salt"),
      "under the pair limit the broadcast route (no salting) must run")
    // an EMPTY band store is refused loudly, not NPE'd (it would
    // admit every document — the unseeded-store misconfiguration)
    val err = intercept[IllegalArgumentException](
      Dedup.dropNearDuplicatesAgainstBanded(
        corpusSigs, banded.filter(lit(false)), inc, "doc_id", "text"))
    assert(err.getMessage.contains("empty"), err.getMessage)
    corpusSigs.unpersist()
  }

  test("word-shingle LSH (q212 unit): exact/near dups pair, char-ambient docs don't; both portable forms") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "alpha beta gamma delta epsilon zeta eta iota" // 1-word tail edit
    // char-5-soaked but word-disjoint: same chars, one space moved —
    // nearly every char window is shared, yet no word 4-gram is
    val c = "thequickbrownfox jumpsoverthelazydog"
    val e = "thequickbrownfoxjumpsoverthelazydog"
    val docs = Seq((1L, a), (2L, a), (3L, b), (4L, c), (5L, e))
      .toDF("doc_id", "text")
    // bands = numHashes -> exact candidate recall (any agreeing
    // position collides), so the assertions are deterministic up to
    // astronomically unlikely base-hash collisions
    for (portable <- Seq(true, false)) {
      val pairs = Dedup.lshNearDupPairs(docs, "doc_id", "text",
        n = 4, numHashes = 64, bands = 64, threshold = 0.3,
        portable = portable, words = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0),
        s"exact dup must pair at est 1.0 (portable=$portable): ${pairs.toSeq}")
      assert(pairs.exists(p => p._1 == 1L && p._2 == 3L),
        s"4-of-6-shared-windows near dup must pair at t=0.3 (portable=$portable)")
      assert(!pairs.exists(p => p._1 == 4L && p._2 == 5L),
        s"word-disjoint docs must not pair however char-similar (portable=$portable)")
    }
    // the contrast that motivates the unit: the char-5 spelling DOES
    // pair the word-disjoint docs (shared char mass is the ambient
    // trap the 100x rehearsal measured going quadratic)
    val charPairs = Dedup.lshNearDupPairs(docs, "doc_id", "text",
      n = 5, numHashes = 64, bands = 64, threshold = 0.3, portable = true)
    assert(charPairs.filter($"id_a" === 4L && $"id_b" === 5L).count() == 1,
      "char-5 unit must pair the chars-shared/words-disjoint docs")
  }

  test("q217 == q212: re-wrapping the corpus with tabs/newlines changes NO word-LSH pair") {
    // the invariant the q217 oracle row rides: word shingles are
    // whitespace-canonical, so the deterministic re-wrap (newline
    // before 'the', tab before 'table') must leave every signature —
    // and therefore every banded pair — bit-identical
    import graft.queries.ExtensionQueries
    val d = TestSpark.sf
    val plain = ExtensionQueries.queries("q212_word_lsh")(spark, d)
      .collect().map(_.toString).sorted.toSeq
    val wrapped = ExtensionQueries.queries("q217_word_lsh_wrapped")(spark, d)
      .collect().map(_.toString).sorted.toSeq
    assert(plain == wrapped && plain.nonEmpty)
  }

  test("whitespace-variant copies collide under word shingles: tab/newline reformat is est 1.0") {
    // THE case word-level near-dedup exists for: the same document
    // re-wrapped with tabs/newlines must produce the IDENTICAL word
    // signature (canonical single-space join), so the pair surfaces
    // at estimated agreement 1.0. Pinned on both portable forms —
    // the r16 fast-path bug made the native (portable) path hash raw
    // byte spans for single-'\t'/'\n' gaps, silently missing exactly
    // this pair.
    val spaced    = "alpha beta gamma delta epsilon zeta eta theta"
    val reWrapped = "alpha\tbeta gamma\ndelta epsilon\tzeta eta\ntheta"
    val wrapped   = "alpha beta gamma delta\nepsilon zeta eta theta"
    val docs = Seq((1L, spaced), (2L, reWrapped), (3L, wrapped))
      .toDF("doc_id", "text")
    for (portable <- Seq(true, false)) {
      val pairs = Dedup.lshNearDupPairs(docs, "doc_id", "text",
        n = 4, numHashes = 64, bands = 64, threshold = 0.3,
        portable = portable, words = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0),
        s"tab/newline re-wrap must collide at est 1.0 (portable=$portable): ${pairs.toSeq}")
      assert(pairs.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 1.0),
        s"single-newline wrap must collide at est 1.0 (portable=$portable): ${pairs.toSeq}")
    }
  }

  // ---------------- foldIntoClusterKeepList ----------------
  // bands = numHashes (1 row per band) makes LSH candidate recall
  // exact — a pair collides iff any signature position agrees — so
  // these fixtures are fully deterministic: pairs are exactly
  // "agreement >= threshold".

  private val FoldT = 0.35
  private def foldFixtureState(oldDocs: org.apache.spark.sql.DataFrame,
      scores: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val (pairs, sigs) = Dedup.lshNearDupPairsWithSignatures(
      oldDocs, "doc_id", "text", n = 3, numHashes = 64, bands = 64, threshold = FoldT)
    val w = Window.partitionBy($"cluster_id").orderBy($"score".desc, $"doc_id".asc)
    val state = Dedup.duplicateClusters(pairs, "id_a", "id_b")
      .select($"id".as("doc_id"), $"cluster_id", $"cluster_size")
      .join(scores, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "cluster_size", "score", "keep")
    (state, sigs)
  }

  test("foldIntoClusterKeepList: untouched increment leaves the keep-list byte-identical") {
    val ta = "aardvark banana cathedral dolphin elephant fortress gorilla"
    val oldDocs = Seq((5L, ta), (9L, ta),
      (8L, "zygote xylophone wombat vulture uakari tamarin serval"))
      .toDF("doc_id", "text")
    val scores = Seq((5L, 1.0), (9L, 2.0), (8L, 0.5), (13L, 9.9)).toDF("doc_id", "score")
    val (state, sigs) = foldFixtureState(oldDocs, scores)
    val novel = Seq((13L, "quarterly amphitheater jurisprudence onomatopoeia"))
      .toDF("doc_id", "text")
    val (updated, newSigs) = Dedup.foldIntoClusterKeepList(
      state, sigs, scores, novel, "doc_id", "text",
      n = 3, numHashes = 64, bands = 64, threshold = FoldT)
    assert(updated.exceptAll(state).count() == 0 &&
      state.exceptAll(updated).count() == 0,
      "an increment touching no cluster must not change a single row")
    sigs.unpersist(); newSigs.unpersist()
  }

  test("foldIntoClusterKeepList: bridge merges two old clusters; singleton promotion; new-new pairs; equality with from-scratch") {
    val ta = "aardvark banana cathedral dolphin elephant fortress gorilla"
    val tb = "hurricane iceberg jaguar kangaroo labyrinth mountain nebula"
    val ts = "orchestra penumbra quasar renegade sapphire tornado umbrella"
    val tu = "zygote xylophone wombat vulture uakari tamarin serval"
    val tn = "velocity waterfall xenon yardstick zeppelin anchor barnacle"
    val oldDocs = Seq(
      (5L, ta), (9L, ta),      // cluster A, cid 5
      (3L, tb), (7L, tb),      // cluster B, cid 3
      (6L, ts),                // old singleton (unclustered)
      (8L, tu)                 // old unrelated (unclustered, stays so)
    ).toDF("doc_id", "text")
    val newBatch = Seq(
      (1L, ta + " " + tb),     // bridge: merges A and B; new min id 1
      (11L, ts),               // exact dup of old singleton 6 -> promotion
      (30L, tn), (31L, tn),    // new-new pair, no old contact
      (40L, "quarterly amphitheater jurisprudence onomatopoeia") // novel
    ).toDF("doc_id", "text")
    val scores = Seq(
      (1L, 0.1), (3L, 0.2), (5L, 0.3), (6L, 0.4), (7L, 5.0), (8L, 0.6),
      (9L, 0.7), (11L, 8.0), (30L, 0.9), (31L, 1.0), (40L, 1.1)
    ).toDF("doc_id", "score")
    val (state, sigs) = foldFixtureState(oldDocs, scores)
    // sanity on the prior state: A and B are separate clusters
    val stateMap = state.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(stateMap.keySet == Set(3L, 5L, 7L, 9L))
    assert(stateMap(5L)._1 == 5L && stateMap(3L)._1 == 3L)
    val (updated, newSigs) = Dedup.foldIntoClusterKeepList(
      state, sigs, scores, newBatch, "doc_id", "text",
      n = 3, numHashes = 64, bands = 64, threshold = FoldT)
    val rows = updated.collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    // merged cluster: bridge + both old clusters, labeled by the NEW min id
    for (id <- Seq(1L, 3L, 5L, 7L, 9L)) {
      assert(rows(id)._1 == 1L, s"doc $id must be in the merged cluster 1")
      assert(rows(id)._2 == 5L, s"merged cluster_size must be 5 for doc $id")
      assert(rows(id)._4 == (id == 7L), s"keep re-elects top score (doc 7), got $id")
    }
    // promotion: old singleton 6 enters with new dup 11; keep = higher score 11
    assert(rows(6L)._1 == 6L && rows(6L)._2 == 2L && !rows(6L)._4)
    assert(rows(11L)._1 == 6L && rows(11L)._2 == 2L && rows(11L)._4)
    // new-new pair clusters among themselves
    assert(rows(30L)._1 == 30L && rows(30L)._2 == 2L)
    assert(rows(31L)._1 == 30L && rows(31L)._4 && !rows(30L)._4,
      "keep elects the higher score (31: 1.0 over 30: 0.9)")
    // novel new doc and untouched unrelated old doc never appear
    assert(!rows.contains(40L) && !rows.contains(8L))
    // incremental == from-scratch over the union corpus
    val (fullState, fullSigs) = foldFixtureState(oldDocs.unionByName(newBatch), scores)
    assert(updated.exceptAll(fullState).count() == 0 &&
      fullState.exceptAll(updated).count() == 0,
      "fold must equal the from-scratch keep-list")
    sigs.unpersist(); newSigs.unpersist(); fullSigs.unpersist()
  }

  test("foldIntoClusterKeepList: q129 split on the synthetic corpus equals from-scratch q128") {
    val inc = graft.queries.ExtensionQueries
      .q129IncrementalKeepList(spark, TestSpark.sf)
    val scratch = graft.queries.ExtensionQueries
      .q128ClusterKeepList(spark, TestSpark.sf)
    assert(inc.exceptAll(scratch).count() == 0 &&
      scratch.exceptAll(inc).count() == 0,
      "incremental fold must reproduce the from-scratch decision table")
  }

  test("simhash: identical text → distance 0; near-dup pairs found") {
    val sims = Dedup.simhashes(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(0L) == sims(1L))
    assert(sims(3L) == sims(4L))
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((3L, 4L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("embedding near-dup: brute finds planted parallel vectors; LSH recovers them") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.999f, 0.01f, 0.0f, 0.0f)),  // near dup of 0
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val brute = Dedup.embeddingNearDupBrute(vecs, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute == Set((0L, 1L)))
    val lsh = Dedup.embeddingNearDupLsh(vecs, "vec_id", "embedding", 0.95,
      dim = 4, planes = 4, tables = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == Set((0L, 1L))) // near-parallel pair shares every bucket
  }

  test("brute top-k: exact ranking with deterministic ties") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", Seq(1.0, 0.0), 2)
      .select("id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L))
  }

  test("lshTopK returns true cosines from probed buckets, sorted") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val brute = Similarity.bruteForceTopK(emb.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.lshTopK(emb.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, 10, dim = 64, planes = 6, probeHamming = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // every LSH hit carries its exact cosine (subset-of-scan property)
    val all = Similarity.bruteForceTopK(emb.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    lsh.foreach { case (id, c) => assert(math.abs(all(id) - c) < 1e-12) }
    assert(lsh.map(_._2).toSeq == lsh.map(_._2).toSeq.sorted.reverse)
    // and the (known-hard, θ≈68°) recall floor holds deterministically
    assert(lsh.map(_._1).toSet.intersect(brute.keySet).size >= 3)
  }

  test("corpus sketch: identical corpora estimate 1.0, disjoint vocabularies near 0") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val self = graft.operators.Dedup.corpusOverlapEstimate(
      docs, docs, "doc_id", "text").head()
    assert(self.getDouble(2) == 1.0, "a corpus fully overlaps itself")
    assert(self.getLong(0) == self.getLong(1))
    // shingle universes with no 5-gram in common
    val latin = (1L to 50L).map(i => (i, s"alpha beta gamma delta epsilon run $i"))
      .toDF("doc_id", "text")
    val digits = (1L to 50L).map(i => (i, s"0123456789 9876543210 000111222 $i"))
      .toDF("doc_id", "text")
    val cross = graft.operators.Dedup.corpusOverlapEstimate(
      latin, digits, "doc_id", "text").head().getDouble(2)
    assert(cross < 0.2, s"disjoint vocabularies must estimate near zero, got $cross")
    // sketch is order/partition independent: repartitioned corpus, same estimate
    val shuffled = graft.operators.Dedup.corpusOverlapEstimate(
      docs.repartition(7), docs.repartition(3), "doc_id", "text").head().getDouble(2)
    assert(shuffled == 1.0)
  }

  test("sourceOverlapMatrix: all pairs once, identical sources 1.0, pair value == corpusOverlapEstimate") {
    val latin = (1L to 30L).map(i => (i, "a", s"alpha beta gamma delta epsilon run $i"))
    val latin2 = (31L to 60L).map(i => (i, "b", s"alpha beta gamma delta epsilon run ${i - 30}"))
    val digits = (61L to 90L).map(i => (i, "c", s"0123456789 9876543210 000111222 ${i - 60}"))
    val nullSrc = Seq((91L, null.asInstanceOf[String], "whatever text this is"))
    val df = (latin ++ latin2 ++ digits ++ nullSrc).toDF("doc_id", "source", "text")
    val m = graft.operators.Dedup.sourceOverlapMatrix(df, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // 3 non-null sources -> 3 unordered pairs, a < b ordering
    assert(m.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // a and b carry the SAME texts (shifted ids): identical universes
    assert(m(("a", "b")).getAs[Double]("est_jaccard") == 1.0)
    assert(m(("a", "c")).getAs[Double]("est_jaccard") < 0.2)
    assert(m(("a", "b")).getAs[Long]("n_docs_a") == 30L)
    // the matrix cell equals the dedicated two-corpus operator
    val pair = graft.operators.Dedup.corpusOverlapEstimate(
      df.filter($"source" === "a"), df.filter($"source" === "c"),
      "doc_id", "text").head().getDouble(2)
    assert(m(("a", "c")).getAs[Double]("est_jaccard") == pair)
  }

  test("mergeGroupSketches: min-merged batch sketches equal the single-pass sketch bit for bit") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val whole = graft.operators.Dedup.groupSketches(docs, "text", "source")
    val merged = graft.operators.Dedup.mergeGroupSketches(
      graft.operators.Dedup.groupSketches(docs.filter($"doc_id" % 2 === 0), "text", "source"),
      graft.operators.Dedup.groupSketches(docs.filter($"doc_id" % 2 =!= 0), "text", "source"))
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    assert(m(merged) == m(whole))
    // a group present on one side only passes through unchanged
    val solo = graft.operators.Dedup.groupSketches(
      Seq((1L, "only", "zz yy xx ww vv uu")).toDF("doc_id", "source", "text"),
      "text", "source")
    val withSolo = graft.operators.Dedup.mergeGroupSketches(whole, solo)
    assert(m(withSolo)("only") == m(solo)("only"))
    assert(m(withSolo).filterNot(_._1 == "only") == m(whole))
  }

  test("keepListImpact and clusterSizeCensus: hand-checked report; q128 invariants") {
    val kl = Seq(
      (1L, 10L, 3L, true), (2L, 10L, 3L, false), (3L, 10L, 3L, false),
      (4L, 20L, 2L, true), (5L, 20L, 2L, false))
      .toDF("doc_id", "cluster_id", "cluster_size", "keep")
    val imp = graft.operators.Dedup.keepListImpact(kl).head()
    assert(imp.getAs[Long]("n_docs_clustered") == 5L)
    assert(imp.getAs[Long]("n_clusters") == 2L)
    assert(imp.getAs[Long]("n_keep") == 2L && imp.getAs[Long]("n_drop") == 3L)
    assert(imp.getAs[Long]("max_cluster_size") == 3L)
    assert(imp.getAs[Double]("drop_frac") == 0.6)
    val cs = graft.operators.Dedup.clusterSizeCensus(kl).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cs == Map(3L -> (1L, 3L), 2L -> (1L, 2L)))
    // over the real decision table: one keeper per cluster, all real clusters
    val real = graft.queries.ExtensionQueries
      .q128ClusterKeepList(spark, TestSpark.sf)
    val rimp = graft.operators.Dedup.keepListImpact(real).head()
    assert(rimp.getAs[Long]("n_keep") == rimp.getAs[Long]("n_clusters"))
    assert(graft.operators.Dedup.clusterSizeCensus(real)
      .filter($"cluster_size" < 2).isEmpty)
  }

  test("fuzzyPairs: token blocking catches leading edits; distance bound and token cap hold") {
    val names = Seq(
      1L -> "cold bolt", 2L -> "old bolt",       // dist 1, prefixes differ
      3L -> "cold ring",                          // shares 'cold', dist 4 from #1
      4L -> "steel hammer", 5L -> "steel hammers",// dist 1 via shared 'steel'
      6L -> "unrelated thing").toDF("id", "name")
    val pairs = Dedup.fuzzyPairs(names, "id", "name", maxDist = 2)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("dist")))
      .toSet
    // the leading-edit pair a prefix blocker would miss
    assert(pairs == Set((1L, 2L, 1L), (4L, 5L, 1L)))
    // string columns ride along when strCol != idCol
    val cols = Dedup.fuzzyPairs(names, "id", "name", maxDist = 2).columns.toSeq
    assert(cols == Seq("id_a", "id_b", "name_a", "name_b", "dist"))
    // dictionary mode (id IS the string): no duplicated columns
    val dict = Dedup.fuzzyPairs(names.select($"name"), "name", "name", maxDist = 2)
    assert(dict.columns.toSeq == Seq("name_a", "name_b", "dist"))
    assert(dict.count() == 2)
    // stop-token cap: every shared token here has df 2, so a cap of 1
    // empties the index — the documented blocking trade-off, loud in tests
    assert(Dedup.fuzzyPairs(names, "id", "name", maxDist = 2, maxTokenDf = 1).isEmpty)
  }

  test("near-dup token discount subsumes the exact-dup discount (q199 vs q196)") {
    import graft.queries.{ExtensionQueries, TokenQueries}
    import org.apache.spark.sql.functions._
    val d = TestSpark.sf
    // corpus-level kept token mass: the near-dup election can only
    // keep LESS than the exact-content election — identical texts
    // always pair (Jaccard 1.0), so every exact-dup group sits inside
    // one near-dup cluster, which keeps exactly one member whose
    // content group exact-dedup also keeps. (Zero-shingle docs — text
    // shorter than the shingle width — are the stated exception; they
    // carry no token mass on this corpus.)
    def totals(df: org.apache.spark.sql.DataFrame) = {
      val r = df.agg(sum("total_tokens"), sum("kept_tokens")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (exTot, exKept) = totals(TokenQueries.q196DedupTokenAccounting(spark, d))
    val (ndTot, ndKept) = totals(TokenQueries.q199NearDupTokenAccounting(spark, d))
    assert(exTot == ndTot, "both accountings denominate the same raw mass")
    assert(ndKept <= exKept,
      s"near-dup must discount at least the exact-dup mass: kept $ndKept vs $exKept")
    assert(ndKept < ndTot, "fixture sanity: the corpus has near-dup mass to discount")
    // doc-level containment: every exact-dropped doc is CLUSTERED by
    // the near-dup pass (it has an identical twin, so it pairs at
    // estimated Jaccard 1.0 in every band)
    val exactDropped = graft.Tables.documents(spark, d)
      .join(graft.operators.Dedup.dropExactDuplicates(
        graft.Tables.documents(spark, d), "doc_id", col("text"))
        .select("doc_id"), Seq("doc_id"), "left_anti")
      .select("doc_id")
    val clustered = ExtensionQueries.q128ClusterKeepList(spark, d).select("doc_id")
    val escaped = exactDropped.join(clustered, Seq("doc_id"), "left_anti").count()
    assert(escaped == 0L,
      s"$escaped exact-duplicate docs escaped the near-dup clustering")
  }
}
