package graft.queries

import graft.CacheLifecycle.FreshPersist
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.DqFunctions._
import graft.operators.{Dedup, Similarity, TextAnalysis, Multimodal}

/** Training-data-pipeline extension queries (SURVEY.md §7.2 M5):
  * dedup, similarity search, text analysis, multimodal plumbing.
  *
  * Every query here is fully oracle-checked. Floating-point
  * computations keep the same sequential left-fold in both engines,
  * so doubles match bit-for-bit; the hash-based families run in
  * portable mode (md5-derived base hashes, DuckDB-expressible) so
  * even MinHash/SimHash signatures and LSH candidate sets hash-match
  * the oracle, with the cheaper xxhash64 fast paths spec-pinned to
  * the same structure.
  */
object ExtensionQueries {

  // Near-dup thresholds chosen against the corpus with a wide empty
  // margin (no pair within ~1e-3 of either cutoff at sf0.01/sf0.1):
  // jaccard: planted near-dups sit ≥0.92, background ≤0.74.
  private val JaccardThreshold = 0.8
  private val CosineThreshold  = 0.4

  // Shared shingle length for q11 (exact) and q12 (LSH) — declared
  // before both (object vals initialize in declaration order; a
  // forward reference would silently read 0 into the oracle SQL).
  // 5-char shingles, not 3: trigrams on natural-language text have a
  // tiny effective universe, so UNRELATED documents share most of
  // their shingle sets (measured ambient Jaccard 0.44 mean / 0.64 p99
  // on the test corpus at n=3, vs 0.17 / 0.25 at n=5). Band collision
  // probability is s^rows, so that ambient mass is exactly what LSH
  // enumerates: 9.6M band-collision rows at n=3 vs ~0.2M at n=5 on
  // 5000 docs — a ~50× candidate reduction — while the ≥0.8 result
  // set is IDENTICAL (25 pairs at sf0.01, 256 at sf0.1, both n): true
  // near-dups sit near Jaccard 1.0 at either length. Longer shingles
  // are the standard Broder-style remedy precisely because they push
  // ambient similarity down without touching near-duplicate pairs.
  private val LshShingleN = 5
  // q212's word-shingle width — the q122 Broder word-4 convention
  private val WordLshN = 4

  // q11 runs the exact inverted-index pair join over the FULL corpus
  // with a stop-shingle document-frequency cap: shingles in more than
  // 40% of documents are dropped before the self-join, bounding the
  // quadratic term (13× fewer join rows at sf0.1) while recovering
  // 24/25 of the uncapped pairs at sf0.01 with zero spurious ones.
  // The scale path for web-size corpora remains the LSH query q12.
  // q11 deliberately stays at n=3 while q12 moved to n=5: the DF cap
  // is the exact path's answer to ambient-similarity mass (hot
  // shingles are dropped, so the trigram universe's overlap never
  // reaches the join), whereas at n=5 almost no shingle exceeds the
  // cap and the posting lists are ~2× longer — measured 3–5× SLOWER.
  // Each query showcases its own scale mechanism at the shingle
  // length where that mechanism is the binding one.
  private val StopShingleDfFraction = 0.4

  // ---------------------------------------------------------------
  // q10 — exact dedup: hash-groupBy duplicate groups.
  // ---------------------------------------------------------------
  def q10DedupExact(spark: SparkSession, d: String): DataFrame =
    Dedup.exactDuplicateGroups(Tables.documents(spark, d), "doc_id", col("text"))

  val q10Sql: String =
    """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
      |  CAST(COUNT(*) AS BIGINT) AS dup_count
      |FROM documents GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q11 — exact n-gram Jaccard near-dup pairs (inverted shingle
  // index; no cross join).
  // ---------------------------------------------------------------
  def q11NgramJaccard(spark: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(
      Tables.documents(spark, d),
      "doc_id", "text", n = 3, threshold = JaccardThreshold,
      maxDfFraction = Some(StopShingleDfFraction))

  val q11Sql: String =
    s"""WITH sh AS (SELECT doc_id, list_distinct(
       |    [substr(text, i, 3) for i in range(1, greatest(length(text) - 2, 1) + 1)]) AS s
       |  FROM documents),
       |ex0 AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |keep AS (SELECT g FROM ex0 GROUP BY g
       |  HAVING CAST(COUNT(*) AS DOUBLE) <=
       |    CAST($StopShingleDfFraction AS DOUBLE) * CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)),
       |ex AS (SELECT doc_id, g FROM ex0 WHERE g IN (SELECT g FROM keep)),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS i
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT ia AS id_a, ib AS id_b,
       |  CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
       |FROM inter JOIN sz sa ON ia = sa.doc_id JOIN sz sb ON ib = sb.doc_id
       |WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= $JaccardThreshold""".stripMargin

  // ---------------------------------------------------------------
  // q122 — asymmetric containment pairs: the quote-wrapped-copy /
  // excerpt-page signal Jaccard misses (a short doc pasted inside a
  // long one has containment ≈ 1 at Jaccard ≈ |short|/|long|). The
  // oracle states the naive inverted-index form with both containment
  // directions.
  //
  // WORD 4-shingles (Broder w-shingling), not character n-grams, as
  // of r9: the containment prefix filter probes the FULL posting list
  // of every prefix shingle (asymmetric similarity admits no bound on
  // the larger side), so candidate count is Σ_g prefix_df(g)·df(g) —
  // and on this small-vocabulary corpus EVERY character shingle
  // length stays ambient (measured at sf0.1: 9.5M of 12.5M possible
  // pairs became candidates at n=3 chars and still ~8M at n=8 chars;
  // 15.2 s warm, the whole suite's worst query, with the verify join
  // as the floor). Word shingles draw from vocab⁴ ≈ 10⁶ values, so
  // unrelated docs share essentially nothing: 39k of 12.5M pairs
  // share ANY shingle at sf0.1 and the warm time drops ~20×. The
  // qualifying result set is the SAME planted near-dup/excerpt pairs
  // (25 at sf0.01, 256 at sf0.1 — verified equal at 3- and 4-word
  // shingles). DF cap stays as a backstop; EvaluationSpec pins the
  // excerpt fixture and the naive-path equality at word shingles.
  // ---------------------------------------------------------------
  private val ContainmentThreshold = 0.62
  private val ContainmentShingleWords = 4

  def q122Containment(spark: SparkSession, d: String): DataFrame =
    Dedup.wordShingleContainmentPairs(
      Tables.documents(spark, d),
      "doc_id", "text", n = ContainmentShingleWords, threshold = ContainmentThreshold,
      maxDfFraction = Some(StopShingleDfFraction))

  val q122Sql: String =
    s"""WITH w AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
       |  FROM documents),
       |sh AS (SELECT doc_id, list_distinct(
       |    [list_aggregate(ws[i:i+${ContainmentShingleWords - 1}], 'string_agg', ' ')
       |     for i in range(1, greatest(len(ws) - ${ContainmentShingleWords - 1}, 0) + 1)]) AS s
       |  FROM w),
       |ex0 AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |keep AS (SELECT g FROM ex0 GROUP BY g
       |  HAVING CAST(COUNT(*) AS DOUBLE) <=
       |    CAST($StopShingleDfFraction AS DOUBLE) * CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)),
       |ex AS (SELECT doc_id, g FROM ex0 WHERE g IN (SELECT g FROM keep)),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS i
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT ia AS id_a, ib AS id_b,
       |  CAST(i AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS containment_a_in_b,
       |  CAST(i AS DOUBLE) / CAST(sb.sz AS DOUBLE) AS containment_b_in_a
       |FROM inter JOIN sz sa ON ia = sa.doc_id JOIN sz sb ON ib = sb.doc_id
       |WHERE GREATEST(CAST(i AS DOUBLE) / CAST(sa.sz AS DOUBLE),
       |               CAST(i AS DOUBLE) / CAST(sb.sz AS DOUBLE))
       |      >= $ContainmentThreshold""".stripMargin

  // ---------------------------------------------------------------
  // q12 — MinHash + LSH banding candidates (the 100 TB dedup path),
  // in portable mode: md5-based base hashes + md5 band buckets, so
  // the DuckDB oracle computes the IDENTICAL signatures, buckets,
  // candidate pairs, and agreement estimates. The xxhash64 fast path
  // (same permutation family, same banding) is spec-pinned to emit
  // the same pair set.
  // ---------------------------------------------------------------
  // 16 bands of 4 rows at numHashes=64: ~0.9998 candidate recall at
  // the 0.8 threshold (8-row bands would drop recall to ~77% — the
  // parameterization trap Curation documents; don't showcase it).
  private val LshBands = 16
  private val LshHashes = 64

  // ---------------------------------------------------------------
  // q62 — corpus-overlap estimate: MinHash sketch (elementwise min
  // of portable signatures = sketch of the shingle-universe union)
  // of the even-id half of documents vs the odd-id half; output is
  // the fraction of agreeing sketch components. Dataset-granularity
  // similarity in one mergeable aggregate per corpus.
  // ---------------------------------------------------------------
  def q62CorpusOverlap(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    Dedup.corpusOverlapEstimate(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", n = LshShingleN, numHashes = LshHashes)
  }

  /** The oracle states each corpus sketch directly over the DISTINCT
    * shingles of the whole corpus half — elementwise min over per-doc
    * signatures IS the min over the union of shingle sets, so both
    * formulations yield identical longs.
    */
  val q62Sql: String = {
    import graft.functions.DqFunctions.{minhashCoeffs, MinhashPrime}
    val sketchExprs = minhashCoeffs(LshHashes)
      .map { case (a, b) => s"min(($a * h + $b) % $MinhashPrime)" }
      .mkString("[\n      ", ",\n      ", "]")
    def side(alias: String, pred: String) =
      s"""sh_$alias AS (SELECT list_distinct(
         |    [substr(text, i, $LshShingleN) for i in range(1, greatest(length(text) - ${LshShingleN - 1}, 1) + 1)]) AS s
         |  FROM documents WHERE $pred),
         |h_$alias AS (SELECT DISTINCT
         |    CAST(CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT) AS BIGINT) % $MinhashPrime AS h
         |  FROM (SELECT unnest(s) AS g FROM sh_$alias)),
         |sk_$alias AS (SELECT $sketchExprs AS sk,
         |    (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE $pred) AS n_docs
         |  FROM h_$alias)""".stripMargin
    s"""WITH ${side("a", "doc_id % 2 = 0")},
       |${side("b", "doc_id % 2 <> 0")}
       |SELECT a.n_docs AS n_docs_a, b.n_docs AS n_docs_b,
       |  CAST(list_sum(list_transform(range(1, ${LshHashes + 1}),
       |    i -> CASE WHEN a.sk[i] = b.sk[i] THEN 1 ELSE 0 END)) AS DOUBLE) / ${LshHashes}.0
       |    AS est_jaccard
       |FROM sk_a a CROSS JOIN sk_b b""".stripMargin
  }

  // ---------------------------------------------------------------
  // q141 — cross-source overlap matrix: estimated Jaccard of every
  // two sources' shingle universes from ONE corpus scan (per-source
  // mergeable MinHash sketches, then a groups² sketch comparison) —
  // "which sources duplicate each other" as a table. The oracle
  // re-derives each source's sketch from its distinct shingle
  // universe directly (different route, identical longs — the q62
  // argument per group) and compares the same pairs.
  // ---------------------------------------------------------------
  def q141SourceOverlap(spark: SparkSession, d: String): DataFrame =
    Dedup.sourceOverlapMatrix(Tables.documents(spark, d), "text", "source",
      n = LshShingleN, numHashes = LshHashes)

  val q141Sql: String = {
    import graft.functions.DqFunctions.{minhashCoeffs, MinhashPrime}
    val sketchExprs = minhashCoeffs(LshHashes)
      .map { case (a, b) => s"min(($a * h + $b) % $MinhashPrime)" }
      .mkString("[\n      ", ",\n      ", "]")
    s"""WITH sh AS (SELECT source, unnest(list_distinct(
       |    [substr(text, i, $LshShingleN) for i in range(1, greatest(length(text) - ${LshShingleN - 1}, 1) + 1)])) AS g
       |  FROM documents WHERE source IS NOT NULL),
       |h0 AS (SELECT DISTINCT source,
       |    CAST(CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT) AS BIGINT) % $MinhashPrime AS h
       |  FROM sh),
       |sk AS (SELECT source, $sketchExprs AS sk FROM h0 GROUP BY source),
       |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents WHERE source IS NOT NULL GROUP BY source)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  na.n_docs AS n_docs_a, nb.n_docs AS n_docs_b,
       |  CAST(list_sum(list_transform(range(1, ${LshHashes + 1}),
       |    i -> CASE WHEN a.sk[i] = b.sk[i] THEN 1 ELSE 0 END)) AS DOUBLE) / ${LshHashes}.0
       |    AS est_jaccard
       |FROM sk a JOIN sk b ON a.source < b.source
       |JOIN nd na ON a.source = na.source
       |JOIN nd nb ON b.source = nb.source""".stripMargin
  }

  // ---------------------------------------------------------------
  // q216 — the MAINTAINED overlap matrix's read path, oracle-exact:
  // the streamed q141 surface resolves its standing answer from an
  // APPEND LOG of per-batch group sketches (the StreamingSketch
  // discipline), folded by elementwise min + doc-count add
  // (mergeGroupSketchLog) into the groups² compare. Min-merging is
  // EXACT (each k-min component over A ∪ B is the min of the
  // per-side minima), so the maintained answer must equal the
  // from-scratch q141 — this row pins that equality BY HASH against
  // q141's own oracle SQL, over a materialized 8-batch log fixture
  // (in production, the artifact the streamed sink appends).
  // ---------------------------------------------------------------
  def q216SketchLogOverlap(spark: SparkSession, d: String): DataFrame = {
    val log = QueryFixtures.ensure(
      spark, d, "q216_sketch_log", "q216_sketch_log_overlap") {
      (0 until 8).map(b =>
        Dedup.groupSketches(
          Tables.documents(spark, d).filter(pmod(col("doc_id"), lit(8)) === b),
          "text", "source", n = LshShingleN, numHashes = LshHashes))
        .reduce(_ unionByName _)
    }
    Dedup.overlapMatrixFromSketches(
      Dedup.mergeGroupSketchLog(log, LshHashes), LshHashes)
  }

  /** q141's from-scratch SQL verbatim: the maintained read path must
    * be indistinguishable from a full rescan. */
  lazy val q216Sql: String = q141Sql

  def q12MinhashLsh(spark: SparkSession, d: String): DataFrame =
    Dedup.lshNearDupPairs(Tables.documents(spark, d),
      "doc_id", "text", n = LshShingleN, numHashes = LshHashes, bands = LshBands,
      threshold = JaccardThreshold, portable = true)

  // ---------------------------------------------------------------
  // q212 — the SCALE spelling of q12: the identical 64×16 banded
  // minhash pipeline over Broder word 4-shingles instead of char
  // 5-grams. The 100× rehearsal (SCALE.md §Round-16) measured q12's
  // char-5 candidate ENUMERATION going ~n² on this small-vocabulary
  // corpus — every char 5-gram is ambient, so unrelated docs band-
  // collide and Σ bucket² blows up while the thresholded OUTPUT
  // stays linear (×3.3 pairs for ×3.33 data). A word 4-gram draws
  // from ~vocab⁴ values, ambient collisions vanish, and the same
  // plan stays near-linear through 100×. q12 keeps its char-5
  // config by the q58/q209 precedent (an index config is part of
  // the pinned result); this row oracle-pins the unit you'd run at
  // 100 TB. The word-window hashes ride the native
  // Md5Prefix.wordNgramHashes (canonical single-space join, zero-
  // copy on single-spaced text), so DuckDB replays them exactly.
  // ---------------------------------------------------------------
  def q212WordLsh(spark: SparkSession, d: String): DataFrame =
    Dedup.lshNearDupPairs(Tables.documents(spark, d),
      "doc_id", "text", n = WordLshN, numHashes = LshHashes, bands = LshBands,
      threshold = JaccardThreshold, portable = true, words = true)

  /** Word-4 shingle CTEs (`w`/`sh`), stated ONCE for every word-unit
    * oracle (q212 pairs, q213 closure via q212, q215 screen, q217's
    * re-wrapped view via `textSql`). The whitespace class is explicit
    * — RE2's \s excludes VT while the engine's (Java's) includes it —
    * and empty edge fields from leading/trailing non-space whitespace
    * are filtered, matching the native tokenizer. */
  private def wordShCtes(textSql: String): String =
    s"""w AS (SELECT doc_id AS id,
       |    list_filter(regexp_split_to_array(trim($textSql), '[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '') AS t
       |  FROM documents),
       |sh AS (SELECT id, list_distinct(CASE WHEN len(t) <= $WordLshN
       |    THEN [array_to_string(t, ' ')]
       |    ELSE [array_to_string(t[i : i + ${WordLshN - 1}], ' ')
       |          for i in range(1, len(t) - $WordLshN + 2)] END) AS s
       |  FROM w)""".stripMargin

  private lazy val wordShCtesSql: String = wordShCtes("text")

  val q212Sql: String = lshPipelineSql(wordShCtesSql)

  // ---------------------------------------------------------------
  // q217 — the word-LSH pipeline over a WHITESPACE-REALISTIC view of
  // the corpus. The synthetic corpus is single-space-only, which is
  // exactly why the r16 word-hash fast-path bug passed every oracle:
  // no hash-checked row ever saw a '\n' or '\t' separator. This row
  // re-wraps the text DETERMINISTICALLY on both sides (' the ' →
  // newline-separated, ' table ' → tab-separated; plain left-to-right
  // all-occurrence replace, identical semantics in Spark and DuckDB)
  // and runs the identical q212 banded pipeline — single-'\n'/'\t'
  // separators now sit on the HASH-CHECKED path, not only in specs,
  // and the result must equal q212's pairs EXACTLY (re-wrapping only
  // changes whitespace, and word shingles are whitespace-canonical).
  // A reintroduced canonicalization bug hash-mismatches this row.
  // ---------------------------------------------------------------
  def q217WordLshWrapped(spark: SparkSession, d: String): DataFrame = {
    val wrapped = org.apache.spark.sql.functions.replace(
      org.apache.spark.sql.functions.replace(
        col("text"), lit(" the "), lit("\nthe ")),
      lit(" table "), lit("\ttable "))
    Dedup.lshNearDupPairs(
      Tables.documents(spark, d).withColumn("text", wrapped),
      "doc_id", "text", n = WordLshN, numHashes = LshHashes, bands = LshBands,
      threshold = JaccardThreshold, portable = true, words = true)
  }

  val q217Sql: String = lshPipelineSql(wordShCtes(
    "replace(replace(text, ' the ', chr(10) || 'the '), " +
      "' table ', chr(9) || 'table ')"))

  /** Mirrors the portable pipeline stage by stage: shingles (the
    * `sh` CTE supplied per unit) → md5 base hash mod p → k-min over
    * the affine family (coefficients embedded as literals) → md5
    * band buckets → distinct pairs → agreement fraction. ONE dag for
    * both shingle units (the shared-renderer discipline) — q12
    * interpolates char windows, q212 word windows.
    */
  /** The shingles→signatures→band-buckets CTE chain (`sh`/`bh`/`sig`
    * /`banded`) shared by every LSH oracle — the pair queries
    * (q12/q212) append the pair tail, q214 the asymmetric screen. */
  private def sigBandCtesSql(shCte: String): String = {
    import graft.functions.DqFunctions.{minhashCoeffs, MinhashPrime}
    val rows = LshHashes / LshBands
    val minExprs = minhashCoeffs(LshHashes).map { case (a, b) =>
      s"list_min(list_transform(h, x -> (${a} * x + ${b}) % $MinhashPrime))"
    }.mkString("[\n      ", ",\n      ", "]")
    s"""$shCte,
       |bh AS (SELECT id, list_transform(s, g ->
       |    CAST(CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT) AS BIGINT) % $MinhashPrime) AS h
       |  FROM sh),
       |sig AS (SELECT id, $minExprs AS sg FROM bh),
       |banded AS (SELECT id, b.band AS band,
       |    CAST(CAST(('0x' || substr(md5(
       |      array_to_string(sg[b.band * $rows + 1 : b.band * $rows + $rows], ',')
       |    ), 1, 15)) AS UBIGINT) AS BIGINT) AS bucket
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, $LshBands)) AS band) b)""".stripMargin
  }

  /** Signature agreement fraction between two `sig` rows. */
  private def agreementSql(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(range(1, ${LshHashes + 1}),
       |      i -> CASE WHEN $a.sg[i] = $b.sg[i] THEN 1 ELSE 0 END)) AS DOUBLE)
       |      / ${LshHashes}.0""".stripMargin

  private def lshPipelineSql(shCte: String): String =
    s"""WITH ${sigBandCtesSql(shCte)},
       |pairs AS (SELECT DISTINCT a.id AS ia, b.id AS ib
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
       |scored AS (SELECT ia AS id_a, ib AS id_b,
       |    ${agreementSql("sa", "sb")} AS est_jaccard
       |  FROM pairs JOIN sig sa ON ia = sa.id JOIN sig sb ON ib = sb.id)
       |SELECT id_a, id_b, est_jaccard FROM scored
       |WHERE est_jaccard >= $JaccardThreshold""".stripMargin

  val q12Sql: String = lshPipelineSql(
    s"""sh AS (SELECT doc_id AS id, list_distinct(
       |    [substr(text, i, $LshShingleN) for i in range(1, greatest(length(text) - ${LshShingleN - 1}, 1) + 1)]) AS s
       |  FROM documents)""".stripMargin)

  // ---------------------------------------------------------------
  // q54 — duplicate clusters: connected components over the q12 LSH
  // pair graph (pairs → canonical keep/drop groups). The oracle
  // replays the identical pair list (q12's SQL as a subquery) and
  // computes components by recursive transitive closure — small-data
  // semantics for the distributed min-label-propagation algorithm.
  // ---------------------------------------------------------------
  def q54DupClusters(spark: SparkSession, d: String): DataFrame = {
    // caller-managed signature cache (the q213 discipline): the
    // closure consumes the pair plan eagerly, so the async
    // release-after-first-use listener could fire on the edge-COUNT
    // job and drop the signature cache before the collect — measured
    // 2.2× on q213's warm passes at sf3 before the fix
    val (pairs, sigs) = Dedup.lshNearDupPairsWithSignatures(
      Tables.documents(spark, d), "doc_id", "text",
      n = LshShingleN, numHashes = LshHashes, bands = LshBands,
      threshold = JaccardThreshold, portable = true)
    val out = Dedup.duplicateClusters(pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"))
    sigs.unpersist(blocking = false)
    out
  }

  // ---------------------------------------------------------------
  // q213 — q54's closure over the SCALE pair unit: connected
  // components on q212's word-shingle LSH pairs. With the char-
  // ambient enumeration gone (q212), this is the dedup closure
  // you'd run at 100 TB — measured with q212 at the 100× rehearsal
  // (SCALE.md §Round-16). Same recursive-closure oracle as q54 (one
  // shared renderer), q212's SQL as the pair subquery.
  // ---------------------------------------------------------------
  def q213WordDupClusters(spark: SparkSession, d: String): DataFrame = {
    // caller-managed signature cache: duplicateClusters consumes the
    // pair plan eagerly (persist + count + driver collect), so by
    // return time every signature consumption has happened and the
    // cache can be dropped synchronously — no listener race, no
    // session-lifetime pin
    val (pairs, sigs) = Dedup.lshNearDupPairsWithSignatures(
      Tables.documents(spark, d), "doc_id", "text",
      n = WordLshN, numHashes = LshHashes, bands = LshBands,
      threshold = JaccardThreshold, portable = true, words = true)
    val out = Dedup.duplicateClusters(pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"))
    sigs.unpersist(blocking = false)
    out
  }

  /** Recursive-transitive-closure oracle over a pair subquery — ONE
    * renderer for q54 (char-5 pairs) and q213 (word-4 pairs):
    * small-data semantics for the distributed min-label-propagation
    * algorithm.
    */
  private def closureSql(pairsSql: String, alias: String): String =
    s"""WITH RECURSIVE p AS (SELECT id_a, id_b FROM ($pairsSql) $alias),
       |edges AS (SELECT id_a AS a, id_b AS b FROM p
       |  UNION SELECT id_b, id_a FROM p),
       |reach(id, r) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.b, r.r FROM reach r JOIN edges e ON e.a = r.id),
       |lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
       |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |  FROM lab GROUP BY 1)
       |SELECT lab.id AS doc_id, lab.cluster_id, sz.cluster_size
       |FROM lab JOIN sz ON lab.cluster_id = sz.cluster_id""".stripMargin

  val q54Sql: String = closureSql(q12Sql, "q12")

  val q213Sql: String = closureSql(q212Sql, "q212")

  // ---------------------------------------------------------------
  // q214 — INCREMENTAL near-dup screen, oracle-exact: the
  // O(increment) production shape (Dedup.dropNearDuplicatesAgainst)
  // pinned by hash. The corpus split is q129's (prior = doc_id % 10
  // != 0, new batch = % 10 == 0); the prior corpus arrives as its
  // MATERIALIZED signature table (the q129_sigs parquet fixture —
  // in production this artifact persists between runs, which is the
  // whole point), and the band join is asymmetric new × corpus.
  // The oracle recomputes both sides' signatures from text (equal to
  // the fixture by md5-portability) and drops every new doc whose
  // agreement with any corpus doc reaches the threshold — the
  // engine's lossless minAgreeingBands prefilter changes nothing at
  // the thresholded result (property-pinned), so the SQL can omit it.
  // ---------------------------------------------------------------
  def q214IncrementalScreen(spark: SparkSession, d: String): DataFrame = {
    val (_, priorSigs, _) =
      ensureKeepListState(spark, d, "q214_incremental_screen")
    val newBatch = Tables.documents(spark, d).filter(col("doc_id") % 10 === 0)
    Dedup.dropNearDuplicatesAgainst(
        priorSigs, newBatch, "doc_id", "text",
        n = LshShingleN, numHashes = LshHashes, bands = LshBands,
        threshold = JaccardThreshold, portable = true)
      .select(col("doc_id"), col("source"))
  }

  /** The asymmetric-screen oracle tail, shared by both shingle units
    * (q214 char-5, q215 word-4): drop every new-batch doc (% 10 == 0)
    * whose agreement with any prior-corpus doc reaches the threshold. */
  private def incrementalScreenSql(shCte: String): String =
    s"""WITH ${sigBandCtesSql(shCte)},
       |drops AS (SELECT DISTINCT n.id
       |  FROM banded n JOIN banded c
       |    ON n.band = c.band AND n.bucket = c.bucket
       |    AND n.id % 10 = 0 AND c.id % 10 <> 0
       |  JOIN sig sn ON sn.id = n.id JOIN sig sc ON sc.id = c.id
       |  WHERE ${agreementSql("sn", "sc")} >= $JaccardThreshold)
       |SELECT d.doc_id, d.source FROM documents d
       |WHERE d.doc_id % 10 = 0
       |  AND d.doc_id NOT IN (SELECT id FROM drops)""".stripMargin

  val q214Sql: String = incrementalScreenSql(
    s"""sh AS (SELECT doc_id AS id, list_distinct(
       |    [substr(text, i, $LshShingleN) for i in range(1, greatest(length(text) - ${LshShingleN - 1}, 1) + 1)]) AS s
       |  FROM documents)""".stripMargin)

  // ---------------------------------------------------------------
  // q215 — the incremental screen in the WORD unit: q214's exact
  // asymmetric shape over a WORD-SIGNED corpus signature fixture —
  // the spelling the 100× rehearsal picked for ambient-char corpora
  // (char-5 candidate enumeration went ~n² on small vocabularies;
  // the word unit runs the identical banded plan sub-linearly). In
  // production the store is signed ONCE in whichever unit the
  // pipeline standardizes on; this pins the word-store path
  // hash-exact, including the canonical single-space join the r16
  // fast-path fix restored.
  // ---------------------------------------------------------------
  def q215WordIncrementalScreen(spark: SparkSession, d: String): DataFrame = {
    val priorSigs = QueryFixtures.ensure(
      spark, d, "q215_word_sigs", "q215_word_incremental_screen") {
      Dedup.minhashSignaturesPortable(
        Tables.documents(spark, d).filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", n = WordLshN, numHashes = LshHashes, words = true)
    }
    // the SECOND materialized artifact: the corpus band table —
    // re-banding the corpus per run was the measured dominant screen
    // cost (r17 increment-scale probe: flat in increment size), so
    // the production spelling reads it from the store
    val priorBanded = QueryFixtures.ensure(
      spark, d, "q215_word_banded", "q215_word_incremental_screen") {
      Dedup.bandedSignatures(priorSigs, LshHashes, LshBands, portable = true)
    }
    val newBatch = Tables.documents(spark, d).filter(col("doc_id") % 10 === 0)
    val (kept, newSigs) = Dedup.dropNearDuplicatesAgainstBanded(
      priorSigs, priorBanded, newBatch, "doc_id", "text",
      n = WordLshN, numHashes = LshHashes, bands = LshBands,
      threshold = JaccardThreshold, portable = true, words = true)
    graft.CacheLifecycle.releaseAfterFirstUse(Seq(newSigs))
    kept.select(col("doc_id"), col("source"))
  }

  val q215Sql: String = incrementalScreenSql(wordShCtesSql)

  // ---------------------------------------------------------------
  // q128 — the dedup DECISION: per clustered doc, keep or drop.
  // q54 says which docs are duplicates of each other; q112 says how
  // good each doc is; this joins them into the action list a curation
  // pipeline actually executes — keep the HIGHEST-QUALITY member of
  // every near-dup cluster (id-ascending tiebreak), drop the rest.
  // The quality-aware canonical policy `Curation.curate` applies
  // internally (canonicalBy), here as an oracle-pinned surface.
  // Clusters are small, so the per-cluster rank window partitions by
  // cluster_id — cluster-count-way parallel, never one task.
  // ---------------------------------------------------------------
  def q128ClusterKeepList(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // q54DupClusters already applies the caller-managed signature-
    // cache discipline (and the closure result is eager), so reusing
    // it shares the fix
    val clusters = q54DupClusters(spark, d)
    val scoredDocs = q112LinearQuality(spark, d).select(col("doc_id"), col("logit"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("logit").desc, col("doc_id").asc)
    clusters.join(scoredDocs, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "cluster_size", "logit", "keep")
  }

  // lazy: q112Sql is declared later in this object, and object vals
  // initialize in declaration order — an eager val would interpolate
  // null into the oracle
  lazy val q128Sql: String =
    s"""WITH clus AS ($q54Sql), q AS ($q112Sql),
       |j AS (SELECT clus.doc_id, clus.cluster_id, clus.cluster_size, q.logit
       |  FROM clus JOIN q ON clus.doc_id = q.doc_id),
       |r AS (SELECT *, row_number() OVER (
       |    PARTITION BY cluster_id ORDER BY logit DESC, doc_id) AS rn FROM j)
       |SELECT doc_id, cluster_id, cluster_size, logit, rn = 1 AS keep FROM r""".stripMargin

  // ---------------------------------------------------------------
  // q129 — INCREMENTAL cluster keep-list: q128's decision table
  // maintained, not recomputed. The corpus is split into a prior
  // corpus (doc_id % 10 != 0) and a new batch (doc_id % 10 == 0);
  // the prior run's state — keep-list + materialized signatures —
  // is built over the prior corpus only, then the batch is FOLDED in
  // via Dedup.foldIntoClusterKeepList: asymmetric new×corpus band
  // join, new×new pairs, connected components over the CONTRACTED
  // graph (old clusters as super-nodes), keep re-election only in
  // touched clusters. The oracle is q128's from-scratch SQL over the
  // full corpus — the whole point is incremental == from-scratch,
  // and this row pins it.
  // ---------------------------------------------------------------
  /** The prior run's state — score table, keep-list decision table and
    * materialized signature store over the prior corpus (doc_id % 10
    * != 0) — written to scratch parquet at most once per process.
    * In production these ARE materialized tables (the whole point of
    * incremental maintenance is that they persist between runs), so
    * the parquet fixture is the honest stand-in; rebuilding them from
    * raw text inside q129's timed region made the bench time the
    * fixture, not the O(increment) fold (r10 verdict item 1).
    */
  private[graft] def ensureKeepListState(
      spark: SparkSession, d: String,
      owner: String = "q129_incremental_keep_list"): (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val scores = QueryFixtures.ensure(spark, d, "q129_scores", owner) {
      q112LinearQuality(spark, d)
        .select(col("doc_id"), col("logit").as("score"))
    }
    val stateDir = QueryFixtures.dirFor(d, "q129_state")
    val sigsDir = QueryFixtures.dirFor(d, "q129_sigs")
    if (!new java.io.File(stateDir, "_SUCCESS").exists() ||
        !new java.io.File(sigsDir, "_SUCCESS").exists()) {
      val priorDocs = Tables.documents(spark, d).filter(col("doc_id") % 10 =!= 0)
      // one LSH pass feeds both outputs (pairs derive from the
      // persisted sigs), so both parquet dirs are written together
      val (priorPairs, priorSigs) = Dedup.lshNearDupPairsWithSignatures(
        priorDocs, "doc_id", "text", n = LshShingleN, numHashes = LshHashes,
        bands = LshBands, threshold = JaccardThreshold, portable = true)
      priorSigs.write.mode("overwrite").parquet(sigsDir)
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("score").desc, col("doc_id").asc)
      Dedup.duplicateClusters(priorPairs, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"))
        .join(scores, "doc_id")
        .withColumn("keep", row_number().over(w) === 1)
        .select("doc_id", "cluster_id", "cluster_size", "score", "keep")
        .write.mode("overwrite").parquet(stateDir)
      priorSigs.unpersist()
    }
    (spark.read.parquet(stateDir), spark.read.parquet(sigsDir), scores)
  }

  def q129IncrementalKeepList(spark: SparkSession, d: String): DataFrame = {
    val newBatch = Tables.documents(spark, d).filter(col("doc_id") % 10 === 0)
    // prior-run state from the materialized store: the timed region is
    // the FOLD — asymmetric new×corpus band join, contracted-graph
    // closure, touched-cluster re-election — which is the operator
    // q129 exists to pin. scores is persisted because the fold
    // consumes it three times (state election, singleton promotion,
    // new-member join); the other two state frames are single-read
    // parquet scans
    val (state, priorSigs, scoresRaw) = ensureKeepListState(spark, d)
    // the char-5 store's band-table twin (the q215 artifact-pair
    // discipline, in this family's pinned unit)
    val priorBanded = QueryFixtures.ensure(spark, d, "q129_banded",
      "q129_incremental_keep_list") {
      Dedup.bandedSignatures(priorSigs, LshHashes, LshBands, portable = true)
    }
    val scores = scoresRaw.persistFresh()
    val (updated, newSigs) = Dedup.foldIntoClusterKeepList(
      state, priorSigs, scores, newBatch, "doc_id", "text",
      n = LshShingleN, numHashes = LshHashes, bands = LshBands,
      threshold = JaccardThreshold, portable = true,
      corpusBanded = Some(priorBanded))
    val out = updated.select(col("doc_id"), col("cluster_id"),
      col("cluster_size"), col("score").as("logit"), col("keep"))
    graft.CacheLifecycle.releaseWhenExecuted(out, Seq(newSigs, scores))
    out
  }

  lazy val q129Sql: String = q128Sql

  // ---------------------------------------------------------------
  // q218 — the incremental keep-list FOLD in the WORD unit: q129's
  // exact fold shape over a WORD-SIGNED state fixture — the unit the
  // 100× rehearsal picked for ambient-char corpora (see q212/q215).
  // q129 keeps its char-5 config by the config-is-part-of-the-
  // pinned-result rule; this row migrates the fold surface to the
  // production unit, completing the incremental family (screen =
  // q215, fold = q218) in the word unit. The prior corpus's word
  // signature table IS the q215_word_sigs fixture — in production
  // ONE materialized signature store serves both the screen and the
  // fold, and sharing the fixture pins exactly that. Oracle: the
  // from-scratch word-unit keep-list (q213 closure + q112 scores)
  // over the full corpus — incremental == from-scratch, hash-pinned
  // in the second shingle unit.
  // ---------------------------------------------------------------
  private[graft] def ensureWordKeepListState(
      spark: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val owner = "q218_word_keep_list_fold"
    val scores = QueryFixtures.ensure(spark, d, "q129_scores", owner) {
      q112LinearQuality(spark, d)
        .select(col("doc_id"), col("logit").as("score"))
    }
    val priorSigs = QueryFixtures.ensure(spark, d, "q215_word_sigs", owner) {
      Dedup.minhashSignaturesPortable(
        Tables.documents(spark, d).filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", n = WordLshN, numHashes = LshHashes, words = true)
    }
    // the band-table twin — the SAME store q215's screen reads (one
    // artifact pair serves screen and fold, as in production)
    val priorBanded = QueryFixtures.ensure(spark, d, "q215_word_banded", owner) {
      Dedup.bandedSignatures(priorSigs, LshHashes, LshBands, portable = true)
    }
    val stateDir = QueryFixtures.dirFor(d, "q218_word_state")
    if (!new java.io.File(stateDir, "_SUCCESS").exists()) {
      val priorPairs = Dedup.lshCandidatePairsFromSignatures(
          priorSigs, LshHashes, LshBands, portableBuckets = true)
        .filter(col("est_jaccard") >= JaccardThreshold)
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("score").desc, col("doc_id").asc)
      Dedup.duplicateClusters(priorPairs, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"))
        .join(scores, "doc_id")
        .withColumn("keep", row_number().over(w) === 1)
        .select("doc_id", "cluster_id", "cluster_size", "score", "keep")
        .write.mode("overwrite").parquet(stateDir)
    }
    (spark.read.parquet(stateDir), priorSigs, priorBanded, scores)
  }

  def q218WordKeepListFold(spark: SparkSession, d: String): DataFrame = {
    val newBatch = Tables.documents(spark, d).filter(col("doc_id") % 10 === 0)
    // the timed region is the FOLD (the q129 discipline): prior-run
    // state — keep-list, signature store AND its band-table twin —
    // arrives from materialized stores; scores is persisted because
    // the fold consumes it three times
    val (state, priorSigs, priorBanded, scoresRaw) = ensureWordKeepListState(spark, d)
    val scores = scoresRaw.persistFresh()
    val (updated, newSigs) = Dedup.foldIntoClusterKeepList(
      state, priorSigs, scores, newBatch, "doc_id", "text",
      n = WordLshN, numHashes = LshHashes, bands = LshBands,
      threshold = JaccardThreshold, portable = true, words = true,
      corpusBanded = Some(priorBanded))
    val out = updated.select(col("doc_id"), col("cluster_id"),
      col("cluster_size"), col("score").as("logit"), col("keep"))
    graft.CacheLifecycle.releaseWhenExecuted(out, Seq(newSigs, scores))
    out
  }

  lazy val q218Sql: String =
    s"""WITH clus AS ($q213Sql), q AS ($q112Sql),
       |j AS (SELECT clus.doc_id, clus.cluster_id, clus.cluster_size, q.logit
       |  FROM clus JOIN q ON clus.doc_id = q.doc_id),
       |r AS (SELECT *, row_number() OVER (
       |    PARTITION BY cluster_id ORDER BY logit DESC, doc_id) AS rn FROM j)
       |SELECT doc_id, cluster_id, cluster_size, logit, rn = 1 AS keep FROM r""".stripMargin

  // ---------------------------------------------------------------
  // q13 — SimHash near-dup pairs (banded Hamming ≤ 3), portable
  // mode: 60-bit md5 token hashes, 15-bit chunk candidates — the
  // DuckDB oracle replays the identical bit arithmetic.
  // ---------------------------------------------------------------
  def q13SimhashNearDup(spark: SparkSession, d: String): DataFrame =
    Dedup.simhashNearDupPairs(Tables.documents(spark, d), "doc_id", "text",
      maxHamming = 3, portable = true)

  val q13Sql: String =
    """WITH tk AS (SELECT doc_id AS id,
      |    list_transform(regexp_extract_all(text, '\S+'),
      |      t -> CAST(CAST(('0x' || substr(md5(t), 1, 15)) AS UBIGINT) AS BIGINT)) AS th
      |  FROM documents),
      |sim AS (SELECT id, CAST(list_sum(list_transform(range(0, 60),
      |    j -> CASE WHEN list_sum(list_transform(th,
      |        x -> CASE WHEN ((x >> j) & 1) = 1 THEN 1 ELSE -1 END)) > 0
      |      THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS s
      |  FROM tk),
      |ck AS (SELECT id, s, c.chunk AS chunk, (s >> (c.chunk * 15)) & 32767 AS ckv
      |  FROM sim CROSS JOIN (SELECT unnest(range(0, 4)) AS chunk) c),
      |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
      |    CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
      |  FROM ck a JOIN ck b ON a.chunk = b.chunk AND a.ckv = b.ckv AND a.id < b.id)
      |SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3""".stripMargin

  // ---------------------------------------------------------------
  // q14 — embedding-cosine near-dup pairs (exact brute baseline).
  // ---------------------------------------------------------------
  def q14EmbeddingNearDup(spark: SparkSession, d: String): DataFrame =
    Dedup.embeddingNearDupBrute(
      Tables.embeddings(spark, d), "vec_id", "embedding", CosineThreshold)

  // ---------------------------------------------------------------
  // q14b — embedding near-dup via hyperplane LSH (the scale path:
  // bucket join ships (id, tbl, bkt) only; pairs deduped before one
  // cosine evaluation). All arithmetic — splitmix-seeded hyperplane
  // literals, sign buckets, cosine folds — is engine-portable, so
  // the DuckDB oracle replays the pipeline exactly: parity is exact
  // regardless of recall. Recall itself is corpus-dependent: this
  // corpus has no true high-cosine pairs (max ≈ 0.51), where sign-
  // bucket collision odds are inherently low; in the dedup regime
  // (cosine → 1) the same parameters give recall → 1 (spec-pinned).
  // ---------------------------------------------------------------
  private val LshTables = 4
  private val LshPlanes = 12

  def q14bEmbeddingNearDupLsh(spark: SparkSession, d: String): DataFrame =
    Dedup.embeddingNearDupLsh(Tables.embeddings(spark, d), "vec_id", "embedding",
      CosineThreshold, dim = 64, planes = LshPlanes, tables = LshTables)

  /** Hyperplane coordinates as exact round-trip double literals. */
  private def planeLit(p: Array[Double]): String =
    p.map(java.lang.Double.toString).mkString("[", ", ", "]")

  /** Sequential index-order dot product — the same left fold the
    * engine's native vector expression computes, so doubles match
    * bit-for-bit. `a` is a float vector (cast), `plane` a double list.
    */
  private def dotPlaneSql(vec: String, plane: String): String =
    s"list_sum(list_transform(range(1, 65), i -> CAST($vec[i] AS DOUBLE) * $plane[i]))"

  private def dotVecSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  val q14bSql: String = {
    val allPlanes = (0 until LshTables)
      .flatMap(t => Dedup.hyperplanes(64, LshPlanes, seedOffset = t * LshPlanes))
    val planeCols = allPlanes.zipWithIndex
      .map { case (p, j) => s"${planeLit(p)} AS p$j" }.mkString(",\n    ")
    def bucket(t: Int) = (0 until LshPlanes)
      .map(j => s"(CASE WHEN ${dotPlaneSql("embedding", s"p${t * LshPlanes + j}")} >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("\n      + ")
    val bandedSelects = (0 until LshTables).map { t =>
      s"SELECT vec_id AS id, $t AS tbl, ${bucket(t)} AS bkt FROM embeddings CROSS JOIN pl"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH pl AS (SELECT
       |    $planeCols),
       |banded AS (
       |  $bandedSelects),
       |pairs AS (SELECT DISTINCT a.id AS ia, b.id AS ib
       |  FROM banded a JOIN banded b ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.id < b.id),
       |p AS (SELECT ia AS id_a, ib AS id_b,
       |    ${dotVecSql("va.embedding", "vb.embedding")} /
       |    (sqrt(${dotVecSql("va.embedding", "va.embedding")}) *
       |     sqrt(${dotVecSql("vb.embedding", "vb.embedding")})) AS cosine
       |  FROM pairs
       |    JOIN embeddings va ON ia = va.vec_id
       |    JOIN embeddings vb ON ib = vb.vec_id)
       |SELECT id_a, id_b, cosine FROM p WHERE cosine >= $CosineThreshold""".stripMargin
  }

  /** The oracle mirrors the engine's exact float→double sequential
    * fold: dot / (sqrt(Σa²) · sqrt(Σb²)) in index order.
    */
  val q14Sql: String =
    s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
       |p AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
       |    (sqrt(list_sum(list_transform(range(1, 65),
       |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
       |     sqrt(list_sum(list_transform(range(1, 65),
       |      i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
       |    AS cosine
       |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cosine FROM p WHERE cosine >= $CosineThreshold""".stripMargin

  // ---------------------------------------------------------------
  // q56 — int8 embedding quantization: per-dimension affine codes
  // (the 4×-smaller at-rest representation for 100 TB vector
  // stores), reported as per-vector reconstruction error. The
  // dimension stats are a one-row broadcast; quantization is a pure
  // projection. Oracle replays the identical arithmetic: half-even
  // rounding (bround ↔ round_even), the same −128/+128 shift, and a
  // strict left-fold error sum.
  // ---------------------------------------------------------------
  private val EmbDim = 64

  def q56Quantization(spark: SparkSession, d: String): DataFrame =
    graft.operators.Quantization.reconstructionReport(
      Tables.embeddings(spark, d), "vec_id", "embedding", EmbDim)

  val q56Sql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |idx AS (SELECT unnest(range(1, ${EmbDim + 1})) AS i),
       |st AS (SELECT i, min(v[i]) AS mn, max(v[i]) AS mx FROM e CROSS JOIN idx GROUP BY i),
       |arrs AS (SELECT list(mn ORDER BY i) AS mins,
       |    list((mx - mn) / 255.0 ORDER BY i) AS scales FROM st),
       |r AS (SELECT vec_id,
       |    list_transform(range(1, ${EmbDim + 1}), i ->
       |      CASE WHEN scales[i] > 0 THEN
       |        abs(v[i] - (mins[i] +
       |          (least(greatest(round_even((v[i] - mins[i]) / scales[i], 0), 0), 255)
       |           - 128 + 128) * scales[i]))
       |      ELSE 0.0 END) AS errs
       |  FROM e CROSS JOIN arrs)
       |SELECT vec_id, list_max(errs) AS max_abs_err,
       |  list_reduce(errs, (a, b) -> a + b) / ${EmbDim}.0 AS mean_abs_err
       |FROM r""".stripMargin

  // ---------------------------------------------------------------
  // q15 — brute-force cosine top-k for a fixed query vector
  // (vec_id 0; k-th/(k+1)-th neighbor gap verified wide).
  // ---------------------------------------------------------------
  private val KnnK = 10

  def q15KnnBrute(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    // 1-row config-style lookup → literal (SURVEY.md §4.2 J2 pattern)
    val q = Similarity.rowVecToDoubles(
      emb.filter(col("vec_id") === 0).select(col("embedding")).head())
    Similarity.bruteForceTopK(
      emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", q, KnnK)
      .withColumnRenamed("id", "vec_id")
  }

  val q15Sql: String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id,
       |  list_sum(list_transform(range(1, 65),
       |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) /
       |  (sqrt(list_sum(list_transform(range(1, 65),
       |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) *
       |   sqrt(list_sum(list_transform(range(1, 65),
       |    i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))))
       |  AS cosine
       |FROM embeddings e, q WHERE vec_id <> 0
       |ORDER BY cosine DESC, vec_id LIMIT $KnnK""".stripMargin

  // ---------------------------------------------------------------
  // q16 — LSH-bucketed ANN top-k (the scale path; recall vs q15
  // additionally pinned in the spec). The bucketing is hyperplane
  // sign bits over double literals — fully portable arithmetic, so
  // the oracle replays bucket assignment, Hamming-ball probing, and
  // the cosine top-k identically.
  // ---------------------------------------------------------------
  def q16KnnLsh(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    val q = Similarity.rowVecToDoubles(
      emb.filter(col("vec_id") === 0).select(col("embedding")).head())
    // planes=6 / probe≤2 scans ~1/3 of buckets; on this corpus (no
    // true high-cosine neighbors, best ≈ 0.37 ⇒ θ ≈ 68°) hyperplane
    // LSH recall is ~0.6 — the honest ANN trade-off; for the dedup
    // regime (cosine → 1) the same parameters give recall → 1.
    Similarity.lshTopK(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        q, KnnK, dim = 64, planes = 6, probeHamming = 2)
      .withColumnRenamed("id", "vec_id")
  }

  /** Probing "all buckets within Hamming ≤ r of the query's bucket"
    * is stated as the equivalent filter bit_count(xor(bkt, qbkt)) ≤ r.
    */
  val q16Sql: String = {
    val planes = Dedup.hyperplanes(64, 6, seedOffset = 0)
    val planeCols = planes.zipWithIndex
      .map { case (p, j) => s"${planeLit(p)} AS p$j" }.mkString(",\n    ")
    def bucket(vec: String) = planes.indices
      .map(j => s"(CASE WHEN ${dotPlaneSql(vec, s"p$j")} >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("\n      + ")
    s"""WITH pl AS (SELECT
       |    $planeCols),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |qb AS (SELECT ${bucket("qv")} AS qbkt FROM q CROSS JOIN pl),
       |vb AS (SELECT vec_id, embedding, ${bucket("embedding")} AS bkt
       |  FROM embeddings CROSS JOIN pl WHERE vec_id <> 0),
       |cand AS (SELECT vec_id, embedding FROM vb CROSS JOIN qb
       |  WHERE bit_count(xor(bkt, qbkt)) <= 2)
       |SELECT vec_id,
       |  ${dotVecSql("embedding", "qv")} /
       |  (sqrt(${dotVecSql("embedding", "embedding")}) *
       |   sqrt(${dotVecSql("qv", "qv")})) AS cosine
       |FROM cand CROSS JOIN q
       |ORDER BY cosine DESC, vec_id LIMIT $KnnK""".stripMargin
  }

  // ---------------------------------------------------------------
  // q17 — language ID (marker-substring heuristic, argmax with
  // deterministic tie-break).
  // ---------------------------------------------------------------
  def q17LangId(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred"))

  val q17Sql: String = {
    def cnt(m: String) =
      s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS INT)"
    val scores = TextAnalysis.LangMarkers.map { case (lang, ms) =>
      lang -> ms.map(cnt).mkString(" + ")
    }
    val scoreCols = scores.map { case (l, e) => s"($e) AS s_$l" }.mkString(",\n    ")
    val best = s"greatest(${scores.map("s_" + _._1).mkString(", ")})"
    val cases = scores.map { case (l, _) =>
      s"WHEN s_$l = best AND s_$l > 0 THEN '$l'"
    }.mkString(" ")
    s"""WITH p0 AS (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents),
       |sc AS (SELECT doc_id, lang,
       |    $scoreCols
       |  FROM p0),
       |b AS (SELECT *, $best AS best FROM sc)
       |SELECT doc_id, lang, CASE $cases ELSE 'und' END AS lang_pred FROM b""".stripMargin
  }

  // ---------------------------------------------------------------
  // q18 — text quality features.
  // ---------------------------------------------------------------
  def q18TextQuality(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityFeatures(Tables.documents(spark, d), "doc_id", "text")

  val q18Sql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish_tokens,
      |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
      |  CASE WHEN length(text) > 0 THEN
      |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
      |      / CAST(length(text) AS DOUBLE) ELSE 0.0 END AS punct_ratio,
      |  CASE WHEN len(regexp_extract_all(text, '\S+')) > 0 THEN
      |    CAST(CAST((length(p) - length(replace(p, ' the ', ''))) / 5 AS INT)
      |       + CAST((length(p) - length(replace(p, ' a ', ''))) / 3 AS INT)
      |       + CAST((length(p) - length(replace(p, ' and ', ''))) / 5 AS INT)
      |       + CAST((length(p) - length(replace(p, ' of ', ''))) / 4 AS INT)
      |       + CAST((length(p) - length(replace(p, ' is ', ''))) / 4 AS INT)
      |       + CAST((length(p) - length(replace(p, ' in ', ''))) / 4 AS INT) AS DOUBLE)
      |      / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) ELSE 0.0 END AS stopword_ratio,
      |  CASE WHEN len(regexp_extract_all(text, '\S+')) > 0 THEN
      |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
      |      / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) ELSE 0.0 END AS mean_word_len
      |FROM (SELECT *, ' ' || text || ' ' AS p FROM documents)""".stripMargin

  // ---------------------------------------------------------------
  // q112 — linear quality gate: a fasttext-style classifier's
  // inference pass as pure codegen'd arithmetic over the q18
  // features. The logit stays raw (sign decides; exp would be a
  // transcendental on the hashed surface) and the oracle reuses
  // q18's feature SQL verbatim, so engine and oracle share ONE
  // feature definition. Weights are exact binary doubles.
  // ---------------------------------------------------------------
  def q112LinearQuality(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.linearQualityScore(
      Tables.documents(spark, d), "doc_id", "text",
      bias = -2.0, wStopword = 8.0, wPunct = -4.0,
      wMeanWordLen = 0.25, wKChars = 0.5)

  val q112Sql: String =
    s"""WITH f AS ($q18Sql)
       |SELECT doc_id,
       |  -2.0 + 8.0 * stopword_ratio + (-4.0) * punct_ratio
       |    + 0.25 * mean_word_len
       |    + 0.5 * (CAST(n_chars AS DOUBLE) / 1024.0) AS logit,
       |  (-2.0 + 8.0 * stopword_ratio + (-4.0) * punct_ratio
       |    + 0.25 * mean_word_len
       |    + 0.5 * (CAST(n_chars AS DOUBLE) / 1024.0)) > 0.0 AS keep
       |FROM f""".stripMargin

  // ---------------------------------------------------------------
  // q19 — per-language token statistics.
  // ---------------------------------------------------------------
  def q19TokenStats(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenStats(Tables.documents(spark, d), "lang", "text")

  val q19Sql: String =
    """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
      |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpeish_tokens,
      |  CAST(SUM(length(text)) AS BIGINT) AS total_chars
      |FROM documents GROUP BY lang""".stripMargin

  // ---------------------------------------------------------------
  // q20 — document fingerprints (sha256 of normalized text).
  // ---------------------------------------------------------------
  def q20Fingerprint(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), contentFingerprint(col("text")).as("sha256_fingerprint"))

  val q20Sql: String =
    """SELECT doc_id,
      |  sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS sha256_fingerprint
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------
  // q21 — multimodal metadata: opaque binary payload + typed meta.
  // (The stubbed decode path is spec-tested; this query checks the
  // binary-column plumbing end-to-end against the oracle.)
  // ---------------------------------------------------------------
  def q21MultimodalMeta(spark: SparkSession, d: String): DataFrame =
    Multimodal.mediaTable(Tables.documents(spark, d), "doc_id", "text", "source")
      .select(col("media_id"), col("kind"),
        length(col("payload")).cast("bigint").as("n_bytes"),
        sha2(col("payload"), 256).as("payload_sha256"))

  val q21Sql: String =
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  sha256(text) AS payload_sha256
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------
  // q38 — repetition quality signals (Gopher/C4-style boilerplate
  // filters): duplicate-line fraction, top-word fraction, duplicate
  // word-bigram fraction. Pure per-row HOFs, oracle-mirrored.
  // ---------------------------------------------------------------
  def q38Repetition(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.repetitionSignals(Tables.documents(spark, d), "doc_id", "text")

  val q38Sql: String =
    """WITH base AS (SELECT doc_id, text,
      |    string_split(text, chr(10)) AS ln,
      |    regexp_extract_all(text, '\S+') AS tk,
      |    [tk[i] || ' ' || tk[i + 1] for i in range(1, len(regexp_extract_all(text, '\S+')))] AS bg
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(ln) AS BIGINT) AS n_lines,
      |  1.0 - CAST(len(list_distinct(ln)) AS DOUBLE) / CAST(len(ln) AS DOUBLE) AS dup_line_frac,
      |  CASE WHEN len(tk) > 0 THEN
      |    CAST(list_max(list_transform(list_distinct(tk),
      |      w -> len(list_filter(tk, x -> x = w)))) AS DOUBLE) / CAST(len(tk) AS DOUBLE)
      |  ELSE 0.0 END AS top_word_frac,
      |  CASE WHEN len(bg) > 0 THEN
      |    1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE)
      |  ELSE 0.0 END AS dup_bigram_frac
      |FROM base""".stripMargin

  // ---------------------------------------------------------------
  // q39 — per-language exact token-count quantiles (length-
  // distribution drift). Exact percentile (linear interpolation at
  // p·(n−1)) == DuckDB quantile_cont.
  // ---------------------------------------------------------------
  def q39TokenQuantiles(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenQuantiles(Tables.documents(spark, d), "lang", "text")

  val q39Sql: String =
    """SELECT lang,
      |  quantile_cont(len(regexp_extract_all(text, '\S+')), 0.5) AS p50_tokens,
      |  quantile_cont(len(regexp_extract_all(text, '\S+')), 0.9) AS p90_tokens,
      |  quantile_cont(len(regexp_extract_all(text, '\S+')), 0.99) AS p99_tokens
      |FROM documents GROUP BY lang""".stripMargin

  // ---------------------------------------------------------------
  // q40 — corpus-frequency quality proxy: mean corpus occurrence
  // count over each doc's token occurrences (boilerplate scores
  // high). Token explode → dictionary aggregate → join back.
  // ---------------------------------------------------------------
  def q40TokenRarity(spark: SparkSession, d: String): DataFrame = {
    val out = TextAnalysis.tokenRarity(Tables.documents(spark, d), "doc_id", "text")
    out.withColumnRenamed("id", "doc_id")
  }

  val q40Sql: String =
    """WITH tk AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w FROM documents),
      |freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cf FROM tk GROUP BY w)
      |SELECT doc_id,
      |  CAST(SUM(cf) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_token_freq,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens
      |FROM tk JOIN freq USING (w) GROUP BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q65 — TF-IDF keyword extraction: top-3 terms per document by
  // tf·(N/df) with (score desc, term asc) determinism. Ratio idf (no
  // log) keeps scores bit-identical across engines (the q45 idiom).
  // ---------------------------------------------------------------
  def q65TfidfKeywords(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.tfidfKeywords(Tables.documents(spark, d), "doc_id", "text", k = 3)

  val q65Sql: String =
    """WITH tk AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY doc_id, term),
      |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS dft FROM tf GROUP BY term),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |scored AS (SELECT doc_id, term, tf,
      |    CAST(tf AS DOUBLE) * CAST(n AS DOUBLE) / CAST(dft AS DOUBLE) AS score
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk FROM scored)
      |SELECT doc_id, term, tf, score, CAST(rnk AS BIGINT) AS kw_rank
      |FROM ranked WHERE rnk <= 3""".stripMargin

  // ---------------------------------------------------------------
  // q66 — overlapping token-window chunking (training/RAG context
  // layout): 32-token chunks every 24 tokens, redundant tail slivers
  // dropped, full coverage. Map-only — no shuffle at any scale.
  // ---------------------------------------------------------------
  private val ChunkTokens = 32
  private val ChunkStride = 24

  def q66Chunks(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.chunkByTokens(Tables.documents(spark, d), "doc_id", "text",
      chunkTokens = ChunkTokens, stride = ChunkStride)

  val q66Sql: String =
    s"""WITH base AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk
       |  FROM documents WHERE len(regexp_extract_all(text, '\\S+')) > 0),
       |ex AS (
       |  SELECT doc_id, tk,
       |    unnest(list_filter(generate_series(1, len(tk), $ChunkStride),
       |      s -> s = 1 OR s <= len(tk) - ${ChunkTokens - ChunkStride})) AS s
       |  FROM base)
       |SELECT doc_id,
       |  CAST((s - 1) // $ChunkStride AS BIGINT) AS chunk_idx,
       |  array_to_string(tk[s : s + ${ChunkTokens - 1}], ' ') AS chunk_text,
       |  CAST(least($ChunkTokens, len(tk) - s + 1) AS BIGINT) AS n_tokens
       |FROM ex""".stripMargin

  // ---------------------------------------------------------------
  // q68 — per-dimension embedding profile (dead-channel / drift
  // diagnostic): n, min, max, mean, stddev per vector dimension.
  // Exact DECIMAL(38,20) sums of per-value-deterministic doubles
  // make the result independent of partitioning and engine; the
  // final mean/stddev evaluate in double from the exact sums.
  // ---------------------------------------------------------------
  def q68EmbeddingProfile(spark: SparkSession, d: String): DataFrame =
    graft.operators.Profiling.profileEmbedding(Tables.embeddings(spark, d), "embedding")

  // Mirrors the operator's fixed-point scheme exactly: half-even
  // integer quantization (round_even ↔ bround), exact integer sums
  // (HUGEINT ↔ decimal), and decimal→double THROUGH A STRING (the
  // engines' native decimal→double casts are not correctly rounded;
  // string→double parsing is, everywhere).
  val q68Sql: String =
    """WITH ex AS (
      |  SELECT unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
      |         unnest(generate_series(0, len(embedding) - 1)) AS dim
      |  FROM embeddings),
      |qz AS (SELECT dim, v, CAST(round_even(v * 1e15, 0) AS HUGEINT) AS w FROM ex),
      |agg AS (
      |  SELECT dim, CAST(count(*) AS BIGINT) AS n, min(v) AS min_v, max(v) AS max_v,
      |         CAST(CAST(sum(w) AS VARCHAR) AS DOUBLE) / 1e15 AS s,
      |         CAST(CAST(sum(w * w) AS VARCHAR) AS DOUBLE) / 1e30 AS sq
      |  FROM qz GROUP BY dim)
      |SELECT CAST(dim AS BIGINT) AS dim, n, min_v, max_v,
      |  s / CAST(n AS DOUBLE) AS mean,
      |  sqrt(greatest(sq - s * s / CAST(n AS DOUBLE), 0.0)
      |    / (CAST(n AS DOUBLE) - 1.0)) AS stddev
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------
  // q73 — pairwise dimension covariance/correlation of the embedding
  // corpus (redundant-dimension diagnostic; PCA-whitening input).
  // Same fixed-point exactness scheme as q68, extended to the
  // cross-products: every sum is exact integer arithmetic, doubles
  // appear only in one fixed final expression, and both engines
  // convert decimal→double THROUGH A STRING.
  // ---------------------------------------------------------------
  def q73EmbeddingCov(spark: SparkSession, d: String): DataFrame =
    graft.operators.Profiling.embeddingCovariance(Tables.embeddings(spark, d), "embedding")

  val q73Sql: String =
    """WITH ex AS (
      |  SELECT vec_id,
      |         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
      |         unnest(generate_series(0, len(embedding) - 1)) AS dim
      |  FROM embeddings),
      |qz AS (SELECT vec_id, dim, CAST(round_even(v * 1e6, 0) AS BIGINT) AS w FROM ex),
      |pairs AS (
      |  SELECT a.dim AS i, b.dim AS j, a.w * b.w AS wij
      |  FROM qz a JOIN qz b ON a.vec_id = b.vec_id AND a.dim < b.dim),
      |pagg AS (
      |  SELECT i, j, CAST(count(*) AS BIGINT) AS n,
      |         CAST(CAST(sum(wij) AS VARCHAR) AS DOUBLE) / 1e12 AS sxy
      |  FROM pairs GROUP BY i, j),
      |dagg AS (
      |  SELECT dim,
      |         CAST(CAST(sum(w) AS VARCHAR) AS DOUBLE) / 1e6 AS s,
      |         CAST(CAST(sum(w * w) AS VARCHAR) AS DOUBLE) / 1e12 AS sq
      |  FROM qz GROUP BY dim)
      |SELECT CAST(p.i AS BIGINT) AS dim_i, CAST(p.j AS BIGINT) AS dim_j, p.n,
      |  (p.sxy - a.s * b.s / CAST(p.n AS DOUBLE)) / (CAST(p.n AS DOUBLE) - 1.0) AS cov,
      |  (p.sxy - a.s * b.s / CAST(p.n AS DOUBLE))
      |    / sqrt(greatest(a.sq - a.s * a.s / CAST(p.n AS DOUBLE), 0.0)
      |         * greatest(b.sq - b.s * b.s / CAST(p.n AS DOUBLE), 0.0)) AS corr
      |FROM pagg p JOIN dagg a ON p.i = a.dim JOIN dagg b ON p.j = b.dim""".stripMargin

  // ---------------------------------------------------------------
  // q75 — fuzzy duplicate pairs (record linkage): every pair of
  // DISTINCT part names within Levenshtein distance 2, found via
  // token blocking (an inverted word index — robust to leading edits
  // that break prefix blocking, e.g. "cold bolt" → "old bolt").
  // ---------------------------------------------------------------
  private val FuzzyMaxDist = 2

  def q75FuzzyPairs(spark: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.fuzzyPairs(
      Tables.part(spark, d).select(col("p_name")).distinct(),
      idCol = "p_name", strCol = "p_name", maxDist = FuzzyMaxDist)

  val q75Sql: String =
    s"""WITH d AS (SELECT DISTINCT p_name FROM part),
       |tok AS (
       |  SELECT DISTINCT p_name, unnest(string_split_regex(p_name, '\\s+')) AS t
       |  FROM d),
       |idx AS (
       |  SELECT p_name, t FROM tok WHERE len(t) > 0
       |    AND t IN (SELECT t FROM tok WHERE len(t) > 0
       |              GROUP BY t HAVING count(*) <= 1000)),
       |cand AS (
       |  SELECT DISTINCT a.p_name AS pa, b.p_name AS pb
       |  FROM idx a JOIN idx b ON a.t = b.t AND a.p_name < b.p_name)
       |SELECT pa AS p_name_a, pb AS p_name_b,
       |  CAST(levenshtein(pa, pb) AS BIGINT) AS dist
       |FROM cand
       |WHERE abs(len(pa) - len(pb)) <= $FuzzyMaxDist
       |  AND levenshtein(pa, pb) <= $FuzzyMaxDist""".stripMargin

  /** Fixture-backed bench rows (see EvalQueries.fixtureBacked): q129's
    * prior-state tables are built by ensureKeepListState, which
    * benchSetup calls before warming these names. */
  val fixtureBacked: Seq[String] =
    Seq("q129_incremental_keep_list", "q214_incremental_screen",
      "q215_word_incremental_screen", "q216_sketch_log_overlap",
      "q218_word_keep_list_fold")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q10_dedup_exact"        -> (q10DedupExact _),
    "q11_ngram_jaccard"      -> (q11NgramJaccard _),
    "q122_containment"       -> (q122Containment _),
    "q12_minhash_lsh"        -> (q12MinhashLsh _),
    "q212_word_lsh"          -> (q212WordLsh _),
    "q62_corpus_overlap"     -> (q62CorpusOverlap _),
    "q141_source_overlap"    -> (q141SourceOverlap _),
    "q13_simhash_neardup"    -> (q13SimhashNearDup _),
    "q54_dup_clusters"       -> (q54DupClusters _),
    "q213_word_dup_clusters" -> (q213WordDupClusters _),
    "q214_incremental_screen" -> (q214IncrementalScreen _),
    "q215_word_incremental_screen" -> (q215WordIncrementalScreen _),
    "q216_sketch_log_overlap" -> (q216SketchLogOverlap _),
    "q217_word_lsh_wrapped" -> (q217WordLshWrapped _),
    "q128_cluster_keep_list" -> (q128ClusterKeepList _),
    "q129_incremental_keep_list" -> (q129IncrementalKeepList _),
    "q218_word_keep_list_fold" -> (q218WordKeepListFold _),
    "q56_quantization"       -> (q56Quantization _),
    "q14_embedding_neardup"  -> (q14EmbeddingNearDup _),
    "q14b_embedding_lsh"     -> (q14bEmbeddingNearDupLsh _),
    "q15_knn_brute"          -> (q15KnnBrute _),
    "q16_knn_lsh"            -> (q16KnnLsh _),
    "q17_lang_id"            -> (q17LangId _),
    "q18_text_quality"       -> (q18TextQuality _),
    "q112_linear_quality"    -> (q112LinearQuality _),
    "q19_token_stats"        -> (q19TokenStats _),
    "q20_fingerprint"        -> (q20Fingerprint _),
    "q21_multimodal_meta"    -> (q21MultimodalMeta _),
    "q38_repetition"         -> (q38Repetition _),
    "q39_token_quantiles"    -> (q39TokenQuantiles _),
    "q40_token_rarity"       -> (q40TokenRarity _),
    "q65_tfidf_keywords"     -> (q65TfidfKeywords _),
    "q66_token_chunks"       -> (q66Chunks _),
    "q68_embedding_profile"  -> (q68EmbeddingProfile _),
    "q73_embedding_cov"      -> (q73EmbeddingCov _),
    "q75_fuzzy_pairs"        -> (q75FuzzyPairs _))

  val oracleSql: Map[String, String] = Map(
    "q10_dedup_exact"        -> q10Sql,
    "q11_ngram_jaccard"      -> q11Sql,
    "q122_containment"       -> q122Sql,
    "q12_minhash_lsh"        -> q12Sql,
    "q212_word_lsh"          -> q212Sql,
    "q62_corpus_overlap"     -> q62Sql,
    "q141_source_overlap"    -> q141Sql,
    "q13_simhash_neardup"    -> q13Sql,
    "q54_dup_clusters"       -> q54Sql,
    "q213_word_dup_clusters" -> q213Sql,
    "q214_incremental_screen" -> q214Sql,
    "q215_word_incremental_screen" -> q215Sql,
    "q216_sketch_log_overlap" -> q216Sql,
    "q217_word_lsh_wrapped" -> q217Sql,
    "q128_cluster_keep_list" -> q128Sql,
    "q129_incremental_keep_list" -> q129Sql,
    "q218_word_keep_list_fold" -> q218Sql,
    "q56_quantization"       -> q56Sql,
    "q14_embedding_neardup"  -> q14Sql,
    "q14b_embedding_lsh"     -> q14bSql,
    "q15_knn_brute"          -> q15Sql,
    "q16_knn_lsh"            -> q16Sql,
    "q17_lang_id"            -> q17Sql,
    "q18_text_quality"       -> q18Sql,
    "q112_linear_quality"    -> q112Sql,
    "q19_token_stats"        -> q19Sql,
    "q20_fingerprint"        -> q20Sql,
    "q21_multimodal_meta"    -> q21Sql,
    "q38_repetition"         -> q38Sql,
    "q39_token_quantiles"    -> q39Sql,
    "q40_token_rarity"       -> q40Sql,
    "q65_tfidf_keywords"     -> q65Sql,
    "q66_token_chunks"       -> q66Sql,
    "q68_embedding_profile"  -> q68Sql,
    "q73_embedding_cov"      -> q73Sql,
    "q75_fuzzy_pairs"        -> q75Sql)
}
