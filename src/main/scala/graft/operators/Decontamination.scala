package graft.operators

import graft.CacheLifecycle.FreshPersist
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Md5Expressions

/** Benchmark decontamination: the standard training-data hygiene pass
  * that flags (and removes) corpus documents sharing word n-grams
  * with an evaluation/benchmark set, so eval results aren't inflated
  * by memorized test data.
  *
  * Semantics: a corpus document is contaminated iff it shares at
  * least `minOverlap` DISTINCT word n-grams with the union of all
  * benchmark documents' n-grams. Exact n-gram match (the published
  * decontamination recipe: 13-gram overlap for GPT-3-style filtering;
  * n is a parameter because short synthetic docs need smaller n).
  *
  * Scale shape: the benchmark side is eval sets — thousands of
  * documents, millions of n-grams — so its distinct shingle-hash set
  * is broadcast and the corpus-side scan never shuffles text: each
  * corpus partition explodes its own shingle hashes, semi-joins the
  * broadcast set map-side, and only (id, matched-hash) survivors
  * reach the one aggregation shuffle. Shingles ride as 60-bit md5
  * prefixes (positive longs, engine-portable for the DuckDB oracle;
  * collision probability ~m²·2⁻⁶⁰ — none observable, and the oracle
  * would surface one as a hash mismatch).
  */
object Decontamination {

  /** Distinct word-n-gram hashes per row: tokens are `\S+` runs;
    * rows with fewer than n tokens contribute none.
    */
  private[graft] def shingleHashes(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val shingles = array_distinct(graft.functions.DqFunctions.wordWindows(
      regexp_extract_all(col(textCol), lit("\\S+"), lit(0)), n, minWindows = 0))
    graft.ParallelSpread.forCpu(df, col(idCol))
      .select(col(idCol).as("id"), explode(shingles).as("_s"))
      .select(col("id"), Md5Expressions.md5PrefixLong(col("_s"), 15).as("h"))
  }

  /** The benchmark's distinct shingle-hash set — materialize/persist
    * this once per benchmark release and reuse across corpus runs.
    */
  def benchmarkShingles(
      bench: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleHashes(bench, idCol, textCol, n).select(col("h")).distinct()

  /** Per-contaminated-document overlap report: (id, n_shared) where
    * n_shared counts distinct corpus-side n-grams also present in the
    * benchmark set; only rows with n_shared ≥ minOverlap appear.
    */
  def contaminationReport(
      corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int, minOverlap: Long = 1L): DataFrame = {
    val benchSet = benchmarkShingles(bench, idCol, textCol, n)
    shingleHashes(corpus, idCol, textCol, n)
      // corpus-side hashes are distinct per id, so a plain count is
      // the distinct-overlap count; broadcast keeps the join map-side
      .join(broadcast(benchSet), Seq("h"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
      .select(col("id").as(idCol), col("n_shared"))
  }

  /** Drop contaminated documents from the corpus (anti-join against
    * the report — the composable curation-funnel stage).
    */
  def decontaminate(
      corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int, minOverlap: Long = 1L): DataFrame =
    corpus.join(
      contaminationReport(corpus, bench, idCol, textCol, n, minOverlap)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** `might_contain` over a serialized `BloomFilter` sketch — wraps
    * Spark's own codegen'd runtime-filter predicate (the expression
    * behind `InjectRuntimeFilter`); the sketch literal deserializes
    * once per task, not per row. Value must be the same long the
    * sketch was built from.
    */
  private def mightContain(bloomBytes: Array[Byte], value: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
      ColumnBridge.expression(value)))
  }

  /** [[contaminationReport]] for benchmark sets too big to broadcast
    * exactly. Same EXACT semantics, different 100 TB plan: a Bloom
    * sketch of the benchmark shingle hashes (~1.2 bytes/item at 1%
    * fpp vs 8+ bytes/item for the exact set) is built distributed,
    * pulled to the driver once (config-sized: `fpp` and the item
    * count bound it), and shipped as a literal — each corpus
    * partition drops non-colliding shingles MAP-SIDE, so only true
    * overlaps plus the ~fpp sliver of false positives ever shuffle.
    * The surviving sliver then confirms against the exact benchmark
    * set with a SHUFFLE semi-join (both sides now small) — false
    * positives die there, and false negatives can't exist (Bloom
    * guarantees no false negatives), so the report equals
    * [[contaminationReport]] row-for-row; only the plan differs.
    *
    * Eager by design: building the sketch runs two jobs (count +
    * sketch aggregation) before the returned plan is assembled —
    * the benchmark side is materialized once per benchmark release
    * in practice, exactly like the exact-set variant.
    */
  /** [[decontaminate]] on the Bloom-prefiltered plan — identical
    * kept set (the report is exact), benchmark-set-sized broadcast
    * replaced by the sketch.
    */
  def decontaminateBloom(
      corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int, minOverlap: Long = 1L, fpp: Double = 0.01): DataFrame =
    corpus.join(
      contaminationReportBloom(corpus, bench, idCol, textCol, n, minOverlap, fpp)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  def contaminationReportBloom(
      corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int, minOverlap: Long = 1L, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val benchSet = benchmarkShingles(bench, idCol, textCol, n).persistFresh()
    val items = math.max(benchSet.count(), 1L)
    val bloom = benchSet.stat.bloomFilter("h", items, fpp)
    val bloomBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val out = shingleHashes(corpus, idCol, textCol, n)
      .filter(mightContain(bloomBytes, col("h")))
      // exact confirm: shuffle semi-join (NOT broadcast — the point of
      // the sketch is that the exact set needn't fit in one place).
      // The hint rides the BUILD side (right, for left_semi).
      .join(benchSet.hint("shuffle_hash"), Seq("h"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
      .select(col("id").as(idCol), col("n_shared"))
    // keyed on the returned plan, NOT the cache: the sketch build above
    // already ran jobs over benchSet, whose async listener events must
    // not release the cache before `out` executes
    graft.CacheLifecycle.releaseWhenExecuted(out, Seq(benchSet))
    out
  }

  /** SEMANTIC contamination report — the embedding-space complement
    * of the n-gram [[contaminationReport]]: paraphrased or lightly
    * rewritten benchmark items share no shingles but sit next to the
    * benchmark in embedding space. A corpus item is flagged when ANY
    * benchmark embedding's cosine reaches `threshold`; the report
    * carries the best match and its cosine for audit.
    *
    * Shape: benchmark broadcast (an eval set is config-sized by
    * construction), corpus scans once, cosine scored map-side with
    * hoisted norms (the annJoinBrute discipline), and the THRESHOLD
    * FILTER RUNS MAP-SIDE BEFORE ANY SHUFFLE — only flagged
    * (corpus, bench) candidate pairs reach the per-corpus-id argmax
    * window, so the shuffle is contamination-sized, not
    * |corpus|×|bench|-sized. Ties on cosine break to the smallest
    * benchmark id (deterministic audit row).
    */
  def semanticContaminationReport(
      corpus: DataFrame, bench: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = broadcast(
      bench.select(col(idCol).as("bench_id"), col(vecCol).as("_bv"),
        graft.functions.DqFunctions.l2Norm(col(vecCol)).as("_bn")))
    val scored = corpus
      .select(col(idCol).as("corpus_id"), col(vecCol).as("_cv"),
        graft.functions.DqFunctions.l2Norm(col(vecCol)).as("_cn"))
      .crossJoin(b)
      .select(col("corpus_id"), col("bench_id"),
        when(col("_cn") > 0 && col("_bn") > 0,
          graft.functions.DqFunctions.dotProduct(col("_cv"), col("_bv"))
            / (col("_cn") * col("_bn")))
          .otherwise(lit(null).cast("double")).as("cosine"))
      .filter(col("cosine") >= lit(threshold))
    val w = Window.partitionBy("corpus_id")
      .orderBy(col("cosine").desc, col("bench_id").asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("corpus_id").as(idCol), col("bench_id"), col("cosine"))
  }

  /** Drop semantically contaminated items (anti-join against the
    * report) — composes with the n-gram stage in a curation funnel:
    * run the exact shingle pass first, this pass on what survives.
    */
  def decontaminateSemantic(
      corpus: DataFrame, bench: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame =
    corpus.join(
      semanticContaminationReport(corpus, bench, idCol, vecCol, threshold)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
