package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.Curation
import graft.Curation.CurationConfig

/** The curation funnel's streaming front-end: the stages that are
  * per-row or keyed-state — quality gate, language gate, exact dedup
  * within a TTL horizon — run continuously on the document stream,
  * so only pre-filtered, pre-deduplicated documents land for the
  * batch stages (near-dedup, decontamination, split) that genuinely
  * need corpus-wide context.
  *
  * Gates reuse the EXACT batch predicates
  * ([[Curation.qualityPredicate]]/[[Curation.languagePredicate]]), so
  * the ADMISSION decision is identical between ingest-time and
  * compact-time filtering. Dedup keys on the same md5 content hash as
  * the batch path ([[graft.operators.Dedup.exactDuplicateGroups]]) —
  * a 64-bit hash would collide with ~50% odds by ~5×10⁹ documents,
  * dropping a distinct document forever. The REPRESENTATIVE differs
  * by necessity: a stream keeps the first arrival per content (it
  * cannot wait for a smaller id that may never come), where the batch
  * path keeps the min id; content-wise the surviving set is the same.
  * Dedup state carries store-native TTL (RocksDB), bounding state by
  * the horizon, not the stream length.
  */
object StreamingCuration {

  /** Emits the first row per content hash; repeats are suppressed
    * until the state's TTL expires. Keyed by the 64-bit content hash;
    * the row (id, text) rides as the value.
    */
  class FirstDocPerContentProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, String), (Long, String)] {
    import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}
    @transient private var seen: ValueState[Boolean] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      seen = getHandle.getValueState[Boolean](
        "seen", Encoders.scalaBoolean, TTLConfig(ttl))

    override def handleInputRows(
        key: String, rows: Iterator[(String, Long, String)],
        timerValues: TimerValues): Iterator[(Long, String)] =
      if (seen.exists() || rows.isEmpty) Iterator.empty
      else {
        seen.update(true)
        val first = rows.next() // first arrival wins within the batch too
        Iterator.single((first._2, first._3))
      }
  }

  /** Quality gate → language gate → TTL exact-dedup over a streaming
    * documents source. Output columns: (idCol, textCol), first
    * occurrence per distinct text within the TTL horizon.
    */
  def gatedDedupedStream(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: CurationConfig = CurationConfig(),
      dedupTtl: java.time.Duration = java.time.Duration.ofHours(24)): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    val t = col(textCol)
    docs
      .filter(Curation.qualityPredicate(t, cfg) && Curation.languagePredicate(t, cfg))
      // md5, NOT xxhash64: same content key as the batch exact dedup,
      // and a 128-bit space so corpus-scale streams can't collide
      .select(md5(t.cast("binary")).as("_h"),
        col(idCol).cast("long").as("_id"), t.as("_text"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new FirstDocPerContentProcessor(dedupTtl),
        TimeMode.ProcessingTime(), OutputMode.Append())
      .toDF(idCol, textCol)
  }

  /** Watermarked per-source REAL-token ingest census: per (window,
    * source), document and BPE-token counts — the unit a training-run
    * budget is denominated in, measured at ingest time instead of in
    * a nightly batch. The token count is the stateless codegen
    * [[graft.functions.Bpe.bpeTokenCount]] expression (map-side, no
    * state beyond the windowed aggregate; bounded by open-windows ×
    * sources rows).
    *
    * The sink is a PARTIALS LOG in the
    * [[StreamingCalibration.windowedBandCensusBy]] sense: (n_docs,
    * total_tokens) are mergeable integers, so
    * [[graft.operators.Sampling.mixturePlanFromTokenCensus]] folds any
    * accumulation of windows into exactly the batch
    * [[graft.operators.Sampling.temperatureMixturePlan]] table — the
    * mixture/epoch plan maintained as a standing query. Rows with a
    * NULL source or NULL text are excluded (the batch plan's stated
    * exclusion).
    */
  def windowedTokenCensus(
      stream: DataFrame, sourceCol: String, textCol: String,
      merges: Seq[(String, String)] = graft.functions.BpeVocab.default,
      tsCol: String = "ts",
      windowLength: String = "1 hour",
      watermarkDelay: String = "1 hour"): DataFrame =
    stream
      .filter(col(sourceCol).isNotNull && col(textCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength),
        col(sourceCol).as("group_key"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(graft.functions.Bpe.bpeTokenCount(col(textCol), merges)
          .cast("long")).as("total_tokens"),
        // bytes ride the same partials log (mergeable integers), so
        // the tokenizer compression ratio — bytes per token, the
        // q202 metric — is a maintained surface for free:
        // TextAnalysis.compressionFromCensus folds the log
        sum(octet_length(col(textCol)).cast("long")).as("total_bytes"))
      .select(col("window.start").as("window_start"),
        col("group_key"), col("n_docs"), col("total_tokens"),
        col("total_bytes"))

  /** Watermarked per-source VOCABULARY census: per (window, source,
    * token), the BPE-token occurrence count — the streaming half of a
    * maintained diversity monitor. State is bounded by open-windows ×
    * sources × observed-vocabulary; the sink is a partials log whose
    * integer rows
    * [[graft.operators.TextAnalysis.tokenEntropyFromCensus]] folds
    * into exactly the batch entropy/TTR table (the census-then-fold
    * discipline, third surface). NULL source/text rows are excluded
    * (the batch exclusion).
    */
  def windowedVocabCensus(
      stream: DataFrame, sourceCol: String, textCol: String,
      merges: Seq[(String, String)] = graft.functions.BpeVocab.default,
      tsCol: String = "ts",
      windowLength: String = "1 hour",
      watermarkDelay: String = "1 hour"): DataFrame =
    stream
      .filter(col(sourceCol).isNotNull && col(textCol).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol),
        col(sourceCol).as("group_key"),
        explode(graft.functions.Bpe.bpeTokens(col(textCol), merges)).as("token"))
      .groupBy(window(col(tsCol), windowLength),
        col("group_key"), col("token"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("group_key"), col("token"), col("n"))

  /** Streaming semantic decontamination screen — the standing-query
    * form of [[graft.operators.Decontamination.decontaminateSemantic]]:
    * each arriving embedding row is scored against the WHOLE benchmark
    * in-expression (the annJoinIvf literal-centroid discipline — the
    * benchmark is an eval set, config-sized by construction, collected
    * once under an explicit guard and unrolled into literal arrays
    * with hoisted norms), so the screen is STATELESS: works in any
    * output mode, no stream-static join support matrix to negotiate,
    * no state store. Output = input columns + `max_bench_cosine` +
    * `is_contaminated`; the caller filters or routes on the flag.
    *
    * Batch/stream parity is spec-pinned: the admitted set equals the
    * batch anti-join's on the same rows (same cosine dag — hoisted
    * norms, one dot per pair).
    */
  def semanticScreen(
      stream: DataFrame, bench: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxBenchRows: Int = 65536): DataFrame = {
    import org.apache.spark.sql.functions._
    val rows = bench.select(col(vecCol)).collect()
    require(rows.length <= maxBenchRows,
      s"benchmark has ${rows.length} rows > $maxBenchRows — a set that " +
        "size is not literal-unrollable; route it through the batch " +
        "decontaminateSemantic pass instead")
    // a NULL benchmark embedding is skipped (it can match nothing);
    // the null check must run BEFORE getSeq dereferences the cell.
    // Cells are read numerically (not getSeq[Float]) so array<double>
    // benchmarks — accepted by the batch decontaminateSemantic path —
    // work here too.
    val vecs = rows.filter(!_.isNullAt(0))
      .map(_.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue).toArray)
    if (vecs.isEmpty)
      return stream
        .withColumn("max_bench_cosine", lit(null).cast("double"))
        .withColumn("is_contaminated", lit(false))
    val cn = graft.functions.DqFunctions.l2Norm(col(vecCol))
    val cosines = vecs.map { v =>
      val norm = math.sqrt(v.map(x => x * x).sum)
      val bl = array(v.map(x => lit(x)).toIndexedSeq: _*)
      when(cn > 0 && lit(norm) > 0,
        graft.functions.DqFunctions.dotProduct(col(vecCol), bl)
          / (cn * lit(norm)))
    }
    // greatest() requires ≥2 args — a 1-row benchmark is legal
    val maxCos =
      if (cosines.length == 1) cosines.head
      else greatest(cosines.toIndexedSeq: _*)
    stream
      .withColumn("max_bench_cosine", maxCos)
      .withColumn("is_contaminated",
        coalesce(col("max_bench_cosine") >= lit(threshold), lit(false)))
  }

  /** Streaming LM quality screen — the standing-query form of
    * [[graft.operators.LanguageModel.scoreStupidBackoff]]. The batch
    * scorer needs a per-document window and per-document aggregation
    * (unsupported on unbounded streams), so the screen applies a
    * COLLECTED model ([[graft.operators.LanguageModel.collectModel]],
    * loudly size-guarded — the semanticScreen discipline) as one
    * stateless codegen expression per row: works in any output mode,
    * no state store, no stream-static join matrix. Scores are the
    * same pre-folded Q16 deltas, so the admitted set is spec-pinned
    * EXACTLY equal to the batch path's on the same rows.
    *
    * Zero-token documents are not scorable: they pass through with
    * NULL score and `low_quality = false` (a screen must not drop
    * rows silently; the batch path EXCLUDES them — stated
    * difference).
    */
  def lmScreen(
      stream: DataFrame, scorer: graft.operators.LmScorer,
      textCol: String, thresholdQ16PerToken: Long): DataFrame = {
    val s = graft.functions.LmScoreExpr(col(textCol), scorer)
    stream
      .withColumn("_lm", s)
      .withColumn("n_tokens", col("_lm.n_tokens").cast("long"))
      .withColumn("score_q16",
        when(col("n_tokens") > 0L, col("_lm.score_q16")))
      .withColumn("avg_log2_prob",
        when(col("n_tokens") > 0L,
          col("score_q16").cast("double")
            / (lit(65536.0) * col("n_tokens").cast("double"))))
      .withColumn("low_quality",
        coalesce(
          col("score_q16") < lit(thresholdQ16PerToken) * col("n_tokens"),
          lit(false)))
      .drop("_lm")
  }

  /** Streamed maintenance for the MULTIMODAL budget (the seventh
    * maintained surface): each micro-batch of media rows runs the
    * REAL header-probe decode and appends ITS OWN per-(kind, source)
    * token census ([[graft.operators.Multimodal.mediaTokenCensus]] —
    * mergeable integers, ≤ kinds × sources rows per batch regardless
    * of batch size) to `path` — the [[StreamingSketch]] append-log
    * discipline, which is also the q202 windowed-census discipline
    * minus the window (the media budget is a running total, not a
    * timeline). Reads fold by addition
    * ([[graft.operators.Multimodal.mediaCensusFromPartials]]) into
    * EXACTLY the batch census of everything that has arrived
    * (spec-pinned streamed == batch on a two-batch split) — so the
    * multimodal mixture budget is a standing query, never a rescan
    * of payload history.
    */
  def mediaCensusSink(
      stream: DataFrame, path: String, checkpoint: String,
      partitions: Int = 32,
      patchSize: Int = graft.operators.Multimodal.DefaultPatchSize,
      videoFrames: Int = 8,
      audioTokensPerSecond: Int =
        graft.operators.Multimodal.DefaultAudioTokensPerSecond)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Multimodal.mediaTokenCensus(
            batch.sparkSession, batch, partitions,
            patchSize, videoFrames, audioTokensPerSecond)
          .write.mode("append").parquet(path)
      }
      .start()

  /** The media-token census of everything appended so far. */
  def readMediaCensus(spark: SparkSession, path: String): DataFrame =
    graft.operators.Multimodal.mediaCensusFromPartials(
      spark.read.parquet(path))

  /** Streamed incremental near-dedup screen (the NINTH maintained
    * surface) — the full production loop of
    * [[graft.operators.Dedup.dropNearDuplicatesAgainst]] as a
    * standing query: each micro-batch is screened against the
    * signature STORE (everything kept so far), survivors land under
    * `keptPath/batch_<id>`, and THEIR signatures grow the store under
    * `storePath/batch_<id>` — so batch N+1 is automatically screened
    * against batch N's keepers, and the band join stays asymmetric
    * new × corpus (O(batch), never O(corpus)) on every trigger.
    *
    * The store is a directory OF signature subtrees: seed it with the
    * existing corpus's signatures at `storePath/base` (a
    * [[graft.operators.Dedup.minhashSignaturesPortable]] write — the
    * materialized between-runs artifact) before starting the stream;
    * an unseeded store is refused loudly rather than treated as an
    * empty corpus (a typo'd path must not admit everything).
    *
    * Replay-safe where a bare append-log is not: foreachBatch can
    * re-run a batch after a failure, so each batch OVERWRITES its own
    * subtree, and the store read EXCLUDES the current batch's subtree
    * — a replayed batch therefore never screens against its own
    * partial output (which would drop every row), and reruns converge
    * to the identical store. Within-batch duplicates pass through,
    * exactly like the batch operator (the intra-batch pass is a
    * separate concern); unit/params must match how the store was
    * signed — the operator's loud width check rides along.
    */
  def incrementalScreenSink(
      stream: DataFrame, idCol: String, textCol: String,
      storePath: String, keptPath: String, checkpoint: String,
      n: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, words: Boolean = false,
      bandedPath: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.col
        def subtrees(rootPath: String, what: String): Seq[String] = {
          val root = new org.apache.hadoop.fs.Path(rootPath)
          val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          // batch_<id> subtrees from id >= current are excluded, not
          // just the current one: after a checkpoint reset that reuses
          // the store path, batch ids restart and a leftover FUTURE
          // subtree (possibly half-written by the dead run) would
          // otherwise silently join the corpus — or fail the read.
          // Non-batch_ names are seeds by contract and always read.
          val batchRe = "batch_(\\d+)".r
          val subs =
            if (fs.exists(root))
              fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
                .filterNot(p => p.getName match {
                  case batchRe(id) => id.toLong >= batchId
                  case _ => false
                })
            else Array.empty[org.apache.hadoop.fs.Path]
          require(subs.nonEmpty,
            s"$what store '$rootPath' has no subtrees — seed it " +
              "(e.g. write the corpus artifact to <store>/base) before " +
              "streaming; an empty store would admit every document")
          subs.map(_.toString).toIndexedSeq
        }
        val store = spark.read.parquet(subtrees(storePath, "signature"): _*)
        // with a banded twin store the per-trigger corpus touch is a
        // pure scan (the broadcast screen path): no re-banding, no
        // corpus shuffle — the artifact pair the probes measured 5×
        val (kept0, newSigs) = bandedPath match {
          case Some(bp) =>
            graft.operators.Dedup.dropNearDuplicatesAgainstBanded(
              store, spark.read.parquet(subtrees(bp, "band"): _*),
              batch, idCol, textCol, n, numHashes, bands, threshold,
              portable = true, words = words)
          case None =>
            graft.operators.Dedup.dropNearDuplicatesAgainstWithSignatures(
              store, batch, idCol, textCol, n, numHashes, bands, threshold,
              portable = true, words = words)
        }
        val kept = kept0.persist()
        kept.write.mode("overwrite").parquet(s"$keptPath/batch_$batchId")
        val keptSigs = newSigs
          .join(kept.select(col(idCol).as("id")), Seq("id"), "left_semi")
        keptSigs.write.mode("overwrite").parquet(s"$storePath/batch_$batchId")
        bandedPath.foreach { bp =>
          graft.operators.Dedup
            .bandedSignatures(keptSigs, numHashes, bands, portable = true)
            .write.mode("overwrite").parquet(s"$bp/batch_$batchId")
        }
        newSigs.unpersist(blocking = false)
        kept.unpersist(blocking = false)
        ()
      }
      .start()

  /** Streamed IVF cell assignment (the TENTH maintained surface) —
    * the ANN family's store maintenance as a standing query: each
    * micro-batch of vectors is assigned against the persisted
    * codebook ([[graft.operators.Similarity.ivfCellAssignments]] —
    * batch-scale argmax, never a corpus pass) and lands under
    * `storePath/batch_<id>`, itself cell-partitioned, so the
    * assignment store the q219 serving path consumes is maintained
    * continuously. Replay-safe the same way the screen sink is: a
    * batch OVERWRITES its own subtree, so reruns converge to the
    * identical store. Seed the log with an existing corpus's bulk
    * assignment at `storePath/base` if one predates the stream.
    *
    * The log is the maintained artifact; serve from it directly
    * ([[readAssignmentLog]] → `annJoinIvfAssigned`), or compact it
    * periodically into a single cell-partitioned table
    * ([[compactAssignmentLog]]) when the subtree count grows — the
    * compacted form is the one whose serving scan dynamic-partition-
    * prunes to the probed cells (PlanShapeSpec's q219 pin).
    * `centroids` must be the SAME codebook the serving path passes —
    * enforced, not just documented: each batch's rows carry the
    * codebook's fingerprint (a partition column), and
    * `annJoinIvfAssigned` refuses to serve a store whose fingerprint
    * differs from its codebook, so a sink restarted with a retrained
    * codebook against an old store path surfaces as a loud serve-time
    * refusal (mixed fingerprints), never as silently wrong neighbors.
    */
  def annAssignSink(
      stream: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, storePath: String, checkpoint: String,
      carry: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery =
    // `carry` columns (e.g. the label the agreement/hard-negative
    // consumers serve from the store) ride each batch's assignment
    // scan and land at rest, exactly as in the batch artifact — seed
    // subtrees must carry the SAME columns (the log read's strict
    // unionByName refuses a drifted pair loudly)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Similarity
          .ivfCellAssignments(batch, centroids, idCol, vecCol, carry)
          .repartition(col("cell"))
          .write.mode("overwrite").partitionBy("cell", "codebook_fp")
          .parquet(s"$storePath/batch_$batchId")
        ()
      }
      .start()

  /** The maintained assignment store: every COMPLETE subtree (seed +
    * batches), each read with its own basePath so the partition
    * columns (cell, codebook_fp) reconstruct per subtree before the
    * union. Completeness is the write's own `_SUCCESS` marker: a
    * subtree a crashed sink batch left half-written has none and is
    * SKIPPED — reading it would poison (fail or corrupt) every
    * serving read until the stream restarts and replays it, and
    * permanently if the stream is dead. The replaying sink overwrites
    * the subtree, at which point it carries the marker and joins the
    * log — the screen sink's future-batch guard, applied to the
    * batch-side serving read. */
  def readAssignmentLog(spark: SparkSession, storePath: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val subs =
      if (fs.exists(root))
        fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      else Array.empty[org.apache.hadoop.fs.Path]
    val complete = subs.filter(p =>
      fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
    require(complete.nonEmpty,
      s"assignment store '$storePath' has no complete subtrees" +
        (if (subs.nonEmpty)
          s" (${subs.length} present, none carrying _SUCCESS — " +
            "half-written leftovers of a dead run?)"
        else "") +
        " — seed it or run annAssignSink before reading")
    complete.map(p =>
        spark.read.option("basePath", p.toString).parquet(p.toString))
      .reduce(_ unionByName _)
  }

  /** Rewrite the assignment log as ONE cell-partitioned table at
    * `outPath` — the serving layout whose probe scan dynamic-
    * partition-prunes (a union-of-subtrees read cannot). Side-by-side
    * only: writing into the log's own files is refused loudly (the
    * takedown/compact discipline). One shuffle, one write job. */
  def compactAssignmentLog(
      spark: SparkSession, logPath: String, outPath: String): Unit = {
    val log = readAssignmentLog(spark, logPath)
    graft.operators.Dedup.appendArtifact(
      Seq(log), log.repartition(col("cell")), outPath,
      partitionBy = Seq("cell", "codebook_fp"))
  }

  /** Everything the screen has kept so far. */
  def readScreenKept(spark: SparkSession, keptPath: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(keptPath)

  /** The current signature store (seed + every kept batch). */
  def readScreenStore(spark: SparkSession, storePath: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(storePath)
}
