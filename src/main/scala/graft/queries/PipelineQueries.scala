package graft.queries

import graft.CacheLifecycle.FreshPersist
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Decontamination, Ranking, Redaction, Retrieval, SemiStructured, Similarity}

/** Training-data pipeline extensions, round 3: benchmark
  * decontamination, PII redaction, batch ANN join. Oracle SQL is
  * generated from the same parameters as the Spark plans so the two
  * can't drift.
  */
object PipelineQueries {

  // ---------------------------------------------------------------
  // q42 — benchmark decontamination: corpus docs sharing ≥1 distinct
  // word 8-gram with the benchmark split (doc_id % 10 == 0) are
  // flagged with their overlap count. Shingle hashes are 60-bit md5
  // prefixes on BOTH engines (the q13 idiom), so the join keys match
  // bit-for-bit.
  // ---------------------------------------------------------------
  private val DecontN = 8
  private val BenchMod = 10

  def q42Decontamination(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    Decontamination.contaminationReport(
      corpus = docs.filter(col("doc_id") % BenchMod =!= 0),
      bench = docs.filter(col("doc_id") % BenchMod === 0),
      idCol = "doc_id", textCol = "text", n = DecontN)
  }

  val q42Sql: String = {
    val h = (s: String) =>
      s"CAST(CAST(('0x' || substr(md5($s), 1, 15)) AS UBIGINT) AS BIGINT)"
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    CASE WHEN len(w) >= $DecontN
       |      THEN list_transform(range(1, len(w) - $DecontN + 2),
       |             i -> array_to_string(w[i:i+${DecontN - 1}], ' '))
       |      ELSE [] END)) AS s
       |  FROM tok),
       |bench AS (SELECT DISTINCT ${h("s")} AS h FROM sh WHERE doc_id % $BenchMod = 0),
       |corp AS (SELECT doc_id, ${h("s")} AS h FROM sh WHERE doc_id % $BenchMod <> 0)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
       |FROM corp JOIN bench USING (h)
       |GROUP BY doc_id HAVING count(*) >= 1""".stripMargin
  }

  // ---------------------------------------------------------------
  // q43 — PII redaction. The synthetic customer table carries no PII
  // text, so the query first composes one deterministically from
  // integer columns (same concat in both engines), then redacts
  // emails, phones, and customer names. Patterns apply in order;
  // counts are taken on the text each pattern actually saw.
  // ---------------------------------------------------------------
  private val PiiRules = Seq(
    Redaction.defaultPatterns.find(_.name == "email").get,
    Redaction.defaultPatterns.find(_.name == "phone").get,
    Redaction.PiiPattern("name", "Customer#\\d+", "<NAME>"))

  def q43PiiRedaction(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d)
    val withText = cust.select(
      col("c_custkey"),
      concat(
        col("c_name"), lit(" contact "),
        when(col("c_custkey") % 3 === 0,
          concat(lit("c"), col("c_custkey").cast("string"), lit("@example.com")))
          .otherwise(lit("none")),
        lit(" ph "),
        ((col("c_custkey") * 7 + 123) % 900 + 100).cast("string"), lit("-"),
        ((col("c_custkey") * 13 + 456) % 900 + 100).cast("string"), lit("-"),
        ((col("c_custkey") * 31 + 789) % 9000 + 1000).cast("string"),
        lit(" seg "), col("c_mktsegment")).as("text"))
    Redaction.redactPii(withText, "c_custkey", "text", PiiRules)
  }

  val q43Sql: String = {
    val textExpr =
      """c_name || ' contact ' ||
        |    CASE WHEN c_custkey % 3 = 0
        |      THEN 'c' || c_custkey || '@example.com' ELSE 'none' END ||
        |    ' ph ' || ((c_custkey * 7 + 123) % 900 + 100) ||
        |    '-' || ((c_custkey * 13 + 456) % 900 + 100) ||
        |    '-' || ((c_custkey * 31 + 789) % 9000 + 1000) ||
        |    ' seg ' || c_mktsegment""".stripMargin
    // fold the rule list exactly as Redaction.redactPii does: count on
    // the text as each pattern sees it, then replace
    val (redacted, counts) =
      PiiRules.foldLeft(("text", Vector.empty[String])) {
        case ((t, acc), p) =>
          // single-quoted DuckDB strings take backslashes literally,
          // so the Java-regex text embeds unchanged (no quotes in rules)
          val rx = "'" + p.regex + "'"
          val n = s"CAST(len(regexp_extract_all($t, $rx)) AS BIGINT) AS n_${p.name}"
          (s"regexp_replace($t, $rx, '${p.replacement}', 'g')", acc :+ n)
      }
    s"""WITH t AS (SELECT c_custkey, $textExpr AS text FROM customer)
       |SELECT c_custkey, $redacted AS text_redacted,
       |  ${counts.mkString(",\n  ")}
       |FROM t""".stripMargin
  }

  // ---------------------------------------------------------------
  // q44 — exact batch ANN join: every 20th vector queries the rest of
  // the corpus for its 3 nearest neighbors by cosine. The IVF variant
  // (annJoinIvf) is spec-pinned for recall instead — approximate
  // results can't hash-match a brute oracle.
  // ---------------------------------------------------------------
  private val AnnK = 3
  private val QueryMod = 20

  def q44AnnJoin(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    Similarity.annJoinBrute(
      queries = emb.filter(col("vec_id") % QueryMod === 0),
      corpus = emb.filter(col("vec_id") % QueryMod =!= 0),
      idCol = "vec_id", vecCol = "embedding", k = AnnK)
  }

  val q44Sql: String = {
    def dot(a: String, b: String) =
      s"""list_sum(list_transform(range(1, 65),
         |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
       |  FROM embeddings WHERE vec_id % $QueryMod = 0),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv
       |  FROM embeddings WHERE vec_id % $QueryMod <> 0),
       |s AS (SELECT query_id, neighbor_id,
       |    ${dot("cv", "qv")} /
       |    (sqrt(${dot("cv", "cv")}) * sqrt(${dot("qv", "qv")})) AS cosine
       |  FROM c, q)
       |SELECT query_id, neighbor_id, cosine FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
       |  FROM s) WHERE rn <= $AnnK""".stripMargin
  }

  // ---------------------------------------------------------------
  // q58 — IVF batch ANN join, bench-visible AND oracle-exact: same
  // query/corpus split as q44 but through the IVF plan (assign cells
  // by argmax cosine against deterministic sampled centroids, probe
  // nprobe cells per query, equi-join on cell — never a cartesian).
  // Every step is portable double arithmetic, so DuckDB replays the
  // whole approximate pipeline and the result hash-matches (the
  // k-means variant stays spec-pinned for recall instead).
  // ---------------------------------------------------------------
  private val IvfNlist = 16
  private val IvfNprobe = 4

  def q58AnnIvf(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    Similarity.annJoinIvfSampled(
      queries = emb.filter(col("vec_id") % QueryMod === 0),
      corpus = emb.filter(col("vec_id") % QueryMod =!= 0),
      idCol = "vec_id", vecCol = "embedding", k = AnnK,
      nlist = IvfNlist, nprobe = IvfNprobe)
  }

  val q58Sql: String = {
    def dot(a: String, b: String) =
      s"""list_sum(list_transform(range(1, 65),
         |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin
    def cos(a: String, b: String) =
      s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    s"""WITH corpus AS (SELECT vec_id AS neighbor_id, embedding AS cv
       |  FROM embeddings WHERE vec_id % $QueryMod <> 0),
       |q AS (SELECT vec_id AS query_id, embedding AS qv
       |  FROM embeddings WHERE vec_id % $QueryMod = 0),
       |cents AS (SELECT CAST(row_number() OVER (ORDER BY neighbor_id) - 1 AS INT) AS c, cv AS ct
       |  FROM (SELECT neighbor_id, cv FROM corpus ORDER BY neighbor_id LIMIT $IvfNlist)),
       |assigned AS (SELECT neighbor_id, cv, cell FROM (
       |    SELECT neighbor_id, cv, c AS cell,
       |      row_number() OVER (PARTITION BY neighbor_id
       |        ORDER BY ${cos("cv", "ct")} DESC, c DESC) AS ar
       |    FROM corpus CROSS JOIN cents) WHERE ar = 1),
       |probes AS (SELECT query_id, qv, cell FROM (
       |    SELECT q.query_id, q.qv, cents.c AS cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cos("qv", "ct")} DESC, c DESC) AS pr
       |    FROM q CROSS JOIN cents) WHERE pr <= $IvfNprobe),
       |scored AS (SELECT p.query_id, a.neighbor_id, ${cos("cv", "qv")} AS cosine
       |  FROM assigned a JOIN probes p ON a.cell = p.cell)
       |SELECT query_id, neighbor_id, cosine FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
       |  FROM scored) WHERE rn <= $AnnK""".stripMargin
  }

  // ---------------------------------------------------------------
  // q209 — the PRODUCTION IVF spelling, oracle-exact: q58's query/
  // corpus split and probe config, but driven the way a 100 TB
  // deployment runs it — a PERSISTED centroid table (codebook
  // fixture) sized by the integer-exact auto-nlist rule
  // (Similarity.autoNlist: smallest power of two p with p·p ≥ n —
  // the measured fix for the fixed-nlist quadratic, SCALE.md
  // §Round-15), consumed by annJoinIvfCentroids (broadcast codebook,
  // JVM-loop cell assignment — the MLlib transform shape that lifts
  // the literal-centroid codegen ceiling). The codebook is the same
  // deterministic id-ordered corpus sample as q58's literal
  // centroids, so DuckDB replays the ENTIRE pipeline including the
  // √n rule (min power-of-two with p*p >= count, capped 256) and the
  // result hash-matches: the exact plan you'd run at scale is
  // oracle-verified, not only spec-pinned to its literal proxy
  // (SkewIvfSpec keeps the bit-equality pin as well).
  // ---------------------------------------------------------------
  private def q209CentroidFixture(
      spark: SparkSession, d: String, owner: String): DataFrame =
    QueryFixtures.ensure(spark, d, "q209_ivf_centroids", owner) {
      val corpus = Tables.embeddings(spark, d)
        .filter(col("vec_id") % QueryMod =!= 0)
      // the auto rule, spelled nlist = 0 at the entry points: one
      // count job, paid once at fixture build (a production codebook
      // is trained/sized once and persisted, which is the point)
      val nl = Similarity.autoNlist(corpus.count())
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
      // id-ordered sample as the codebook, cell = sample rank — the
      // annJoinIvfSampled centroid convention persisted as a table
      // (config-sized: nl <= 256 rows, the single-partition window
      // is free here)
      corpus.orderBy(col("vec_id")).limit(nl)
        .select(col("vec_id"), col("embedding"))
        .withColumn("cell", (row_number().over(w) - 1).cast("int"))
        .select(col("cell"), col("embedding").as("centroid"))
    }

  def q209AnnIvfAuto(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    Similarity.annJoinIvfCentroids(
      queries = emb.filter(col("vec_id") % QueryMod === 0),
      corpus = emb.filter(col("vec_id") % QueryMod =!= 0),
      centroids = q209CentroidFixture(spark, d, "q209_ann_ivf_auto"),
      idCol = "vec_id", vecCol = "embedding", k = AnnK, nprobe = IvfNprobe)
  }

  val q209Sql: String = {
    def dot(a: String, b: String) =
      s"""list_sum(list_transform(range(1, 65),
         |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin
    def cos(a: String, b: String) =
      s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    s"""WITH corpus AS (SELECT vec_id AS neighbor_id, embedding AS cv
       |  FROM embeddings WHERE vec_id % $QueryMod <> 0),
       |q AS (SELECT vec_id AS query_id, embedding AS qv
       |  FROM embeddings WHERE vec_id % $QueryMod = 0),
       |nl AS (SELECT coalesce((SELECT min(p)
       |    FROM (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128, 256]) AS p)
       |    WHERE CAST(p AS BIGINT) * p >= (SELECT count(*) FROM corpus)),
       |  256) AS v),
       |cents AS (SELECT CAST(rn - 1 AS INT) AS c, cv AS ct FROM (
       |    SELECT cv, row_number() OVER (ORDER BY neighbor_id) AS rn
       |    FROM corpus) WHERE rn <= (SELECT v FROM nl)),
       |assigned AS (SELECT neighbor_id, cv, cell FROM (
       |    SELECT neighbor_id, cv, c AS cell,
       |      row_number() OVER (PARTITION BY neighbor_id
       |        ORDER BY ${cos("cv", "ct")} DESC, c DESC) AS ar
       |    FROM corpus CROSS JOIN cents) WHERE ar = 1),
       |probes AS (SELECT query_id, qv, cell FROM (
       |    SELECT q.query_id, q.qv, cents.c AS cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cos("qv", "ct")} DESC, c DESC) AS pr
       |    FROM q CROSS JOIN cents)
       |  WHERE pr <= least($IvfNprobe, (SELECT v FROM nl))),
       |scored AS (SELECT p.query_id, a.neighbor_id, ${cos("cv", "qv")} AS cosine
       |  FROM assigned a JOIN probes p ON a.cell = p.cell)
       |SELECT query_id, neighbor_id, cosine FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
       |  FROM scored) WHERE rn <= $AnnK""".stripMargin
  }

  // ---------------------------------------------------------------
  // q219 — q209 with the corpus-side cell assignment consumed from
  // its MATERIALIZED store: the band-table discipline applied to the
  // ANN family. Until this row, every IVF query re-assigned the
  // whole corpus against the codebook per run (nlist × dim flops per
  // corpus row — the same O(corpus)-floor shape the r17 increment
  // probe caught in the dedup screen); here the (id, vec, cell)
  // assignment is built ONCE next to the q209 codebook, written
  // partitioned BY CELL (the IVF inverted-list layout at rest), and
  // the query's per-run corpus touch is a scan of the store. The
  // oracle is q209's from-scratch SQL verbatim — stored-assignment
  // == recompute-everything, pinned by hash.
  // ---------------------------------------------------------------
  private def ensureIvfAssignedStore(spark: SparkSession, d: String): DataFrame = {
    val cents = q209CentroidFixture(spark, d, "q219_ann_ivf_assigned")
    val dir = QueryFixtures.dirFor(d, "q219_ivf_assigned")
    if (!new java.io.File(dir, "_SUCCESS").exists())
      // repartition by cell → one file per cell (the posting-list
      // layout at rest); bare partitionBy writes tasks × cells small
      // files and the store read pays a listing tax instead. The
      // codebook fingerprint is the second partition key, so BOTH
      // serve-time guards (version match, cell coverage) read
      // directory metadata — no store job before the probe join
      Similarity.ivfCellAssignments(
          Tables.embeddings(spark, d).filter(col("vec_id") % QueryMod =!= 0),
          cents, "vec_id", "embedding")
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell", "codebook_fp").parquet(dir)
    spark.read.parquet(dir)
  }

  def q219AnnIvfAssigned(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    Similarity.annJoinIvfAssigned(
      queries = emb.filter(col("vec_id") % QueryMod === 0),
      assigned = ensureIvfAssignedStore(spark, d),
      centroids = q209CentroidFixture(spark, d, "q219_ann_ivf_assigned"),
      idCol = "vec_id", vecCol = "embedding", k = AnnK, nprobe = IvfNprobe)
  }

  // ---------------------------------------------------------------
  // q220 — q219 over a store GROWN BY APPENDS: the corpus assignment
  // arrives as two batch appends (Similarity.appendCellAssignments —
  // the daily-increment write path, preserving the cell-partitioned
  // layout) instead of one bulk build. Serving from the grown store
  // must be indistinguishable from serving from the bulk store must
  // be indistinguishable from recomputing — oracle is q209's
  // from-scratch SQL verbatim, so the APPEND path itself sits on the
  // hash-checked gate (a dropped batch, a layout-breaking write, or
  // a partition-column round-trip bug all flip the hash).
  // ---------------------------------------------------------------
  private def ensureIvfGrownStore(spark: SparkSession, d: String): DataFrame = {
    val cents = q209CentroidFixture(spark, d, "q220_ann_ivf_grown")
    val dir = QueryFixtures.dirFor(d, "q220_ivf_grown")
    // two writes build this fixture, so a bare _SUCCESS (present
    // after the FIRST append) cannot gate it — mark completion
    // explicitly once both batches landed. And because the writes are
    // APPENDS, a retry after a death between them must not land on
    // top of the first run's leftovers (mode append would duplicate
    // batch rows — a q220 hash failure that never self-heals): when
    // the completion marker is absent, any partial directory is
    // deleted first, making the build idempotent
    val ok = new java.io.File(dir, "_GROWN_OK")
    if (!ok.exists()) {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val corpus = Tables.embeddings(spark, d)
        .filter(col("vec_id") % QueryMod =!= 0)
      for (parity <- Seq(0, 1))
        Similarity.appendCellAssignments(Seq(cents),
          Similarity.ivfCellAssignments(
            corpus.filter(col("vec_id") % 2 === parity),
            cents, "vec_id", "embedding"),
          cents, dir)
      ok.createNewFile()
    }
    spark.read.parquet(dir)
  }

  def q220AnnIvfGrown(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    Similarity.annJoinIvfAssigned(
      queries = emb.filter(col("vec_id") % QueryMod === 0),
      assigned = ensureIvfGrownStore(spark, d),
      centroids = q209CentroidFixture(spark, d, "q220_ann_ivf_grown"),
      idCol = "vec_id", vecCol = "embedding", k = AnnK, nprobe = IvfNprobe)
  }

  // ---------------------------------------------------------------
  // q221/q222/q223 — the IVF CONSUMERS routed through the assignment
  // store: until these rows, q219 removed the per-run corpus argmax
  // for the plain ANN join only, while the label-agreement diagnostic
  // (q92), hard-negative mining (q123) and the retrieval-quality eval
  // (q135) still re-assigned the whole corpus per run — the exact
  // O(corpus) floor the store exists to remove. One store fixture
  // serves all three (labels ride the inverted list at rest via
  // `carry` — serving never joins the corpus), built against the
  // sibling queries' 16-cell id-ordered codebook so each oracle is
  // the sibling's from-scratch SQL VERBATIM: stored == recompute,
  // pinned by hash on every consumer, the q219 pattern.
  // ---------------------------------------------------------------
  private def ivf16CentroidFixture(
      spark: SparkSession, d: String, owner: String): DataFrame =
    QueryFixtures.ensure(spark, d, "q221_ivf16_centroids", owner) {
      val corpus = Tables.embeddings(spark, d)
        .filter(col("vec_id") % QueryMod =!= 0)
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
      // q58/q92/q123's sampled-centroid convention as a table:
      // id-ordered first IvfNlist corpus vectors, cell = sample rank
      corpus.orderBy(col("vec_id")).limit(IvfNlist)
        .select(col("vec_id"), col("embedding"))
        .withColumn("cell", (row_number().over(w) - 1).cast("int"))
        .select(col("cell"), col("embedding").as("centroid"))
    }

  private def ensureIvf16AssignedStore(
      spark: SparkSession, d: String, owner: String): DataFrame = {
    val cents = ivf16CentroidFixture(spark, d, owner)
    val dir = QueryFixtures.dirFor(d, "q221_ivf16_assigned")
    if (!new java.io.File(dir, "_SUCCESS").exists())
      Similarity.ivfCellAssignments(
          Tables.embeddings(spark, d).filter(col("vec_id") % QueryMod =!= 0),
          cents, "vec_id", "embedding", carry = Seq("label"))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell", "codebook_fp").parquet(dir)
    spark.read.parquet(dir)
  }

  def q221LabelPurityIvfAssigned(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    Similarity.knnLabelAgreementIvfAssigned(
      queries = emb.filter(col("vec_id") % QueryMod === 0),
      assigned = ensureIvf16AssignedStore(spark, d, "q221_label_purity_ivf_assigned"),
      centroids = ivf16CentroidFixture(spark, d, "q221_label_purity_ivf_assigned"),
      idCol = "vec_id", vecCol = "embedding", labelCol = "label",
      k = AnnK, nprobe = IvfNprobe)
  }

  def q222HardNegativesAssigned(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    Similarity.hardNegativesIvfAssigned(
      queries = emb.filter(col("vec_id") % QueryMod === 0),
      assigned = ensureIvf16AssignedStore(spark, d, "q222_hard_negatives_assigned"),
      centroids = ivf16CentroidFixture(spark, d, "q222_hard_negatives_assigned"),
      idCol = "vec_id", vecCol = "embedding", labelCol = "label",
      k = AnnK, nprobe = IvfNprobe)
  }

  // q135's eval with the RUN leg served from the store: the index
  // under evaluation is the production (stored-assignment) spelling,
  // not its recompute proxy — truth stays the materialized brute
  // fixture, metrics are byte-shared with q135, oracle is q135's SQL
  // verbatim.
  def q223RetrievalQualityAssigned(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, d)
    val run = Similarity.annJoinIvfAssigned(
      queries = emb.filter(col("vec_id") % QueryMod === 0),
      assigned = ensureIvf16AssignedStore(spark, d, "q223_retrieval_quality_assigned"),
      centroids = ivf16CentroidFixture(spark, d, "q223_retrieval_quality_assigned"),
      idCol = "vec_id", vecCol = "embedding", k = AnnK, nprobe = IvfNprobe)
      .persistFresh()
    val truth = QueryFixtures.ensure(spark, d, "q135_truth",
      "q223_retrieval_quality_assigned")(q44AnnJoin(spark, d))
      .persistFresh()
    val rq = Ranking.retrievalQuality(run,
      truth.select(col("query_id"), col("neighbor_id")),
      "query_id", "neighbor_id", "cosine", k = AnnK)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val graded = truth.withColumn("gain",
      (lit(AnnK + 1) - row_number().over(w)).cast("long"))
    val nd = Ranking.ndcgAtK(run, graded,
      "query_id", "neighbor_id", "cosine", "gain", k = AnnK)
    val out = rq.join(nd, Seq("query_id"))
    graft.CacheLifecycle.releaseWhenExecuted(out, Seq(run, truth))
    out
  }

  // ---------------------------------------------------------------
  // q224 — the ANN family's RETRAIN TRIGGER: chi-square cell-
  // occupancy drift of an incoming batch (the query-slice vectors,
  // assigned under the serving codebook — the same ivfCellAssignments
  // output the append path needs, so the argmax is paid once for
  // drift AND append) against the q219 store's baseline histogram.
  // Recall degrades SILENTLY when the incoming distribution wanders
  // off the codebook; this is the monitor that says when — and, per
  // cell, WHERE — to retrain. Oracle = q209's assignment CTEs over
  // both slices feeding q52's drift arithmetic verbatim, so the
  // monitored statistic is engine-exact, not approximately agreed.
  // ---------------------------------------------------------------
  def q224CodebookDrift(spark: SparkSession, d: String): DataFrame = {
    val cents = q209CentroidFixture(spark, d, "q224_codebook_drift")
    val batch = Similarity.ivfCellAssignments(
      Tables.embeddings(spark, d).filter(col("vec_id") % QueryMod === 0),
      cents, "vec_id", "embedding")
    Similarity.codebookDrift(batch, ensureIvfAssignedStore(spark, d), cents)
  }

  val q224Sql: String = {
    def dot(a: String, b: String) =
      s"""list_sum(list_transform(range(1, 65),
         |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin
    def cos(a: String, b: String) =
      s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    val exp =
      "CAST(n_baseline AS DOUBLE) / CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE)"
    s"""WITH corpus AS (SELECT vec_id AS neighbor_id, embedding AS cv
       |  FROM embeddings WHERE vec_id % $QueryMod <> 0),
       |q AS (SELECT vec_id AS query_id, embedding AS qv
       |  FROM embeddings WHERE vec_id % $QueryMod = 0),
       |nl AS (SELECT coalesce((SELECT min(p)
       |    FROM (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128, 256]) AS p)
       |    WHERE CAST(p AS BIGINT) * p >= (SELECT count(*) FROM corpus)),
       |  256) AS v),
       |cents AS (SELECT CAST(rn - 1 AS INT) AS c, cv AS ct FROM (
       |    SELECT cv, row_number() OVER (ORDER BY neighbor_id) AS rn
       |    FROM corpus) WHERE rn <= (SELECT v FROM nl)),
       |base AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_baseline FROM (
       |    SELECT neighbor_id, c AS cell,
       |      row_number() OVER (PARTITION BY neighbor_id
       |        ORDER BY ${cos("cv", "ct")} DESC, c DESC) AS ar
       |    FROM corpus CROSS JOIN cents) WHERE ar = 1 GROUP BY cell),
       |cur AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_current FROM (
       |    SELECT query_id, c AS cell,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY ${cos("qv", "ct")} DESC, c DESC) AS ar
       |    FROM q CROSS JOIN cents) WHERE ar = 1 GROUP BY cell),
       |j AS (SELECT coalesce(cur.cell, base.cell) AS cell,
       |    coalesce(n_current, 0) AS n_current,
       |    coalesce(n_baseline, 0) AS n_baseline
       |  FROM cur FULL OUTER JOIN base
       |    ON cur.cell IS NOT DISTINCT FROM base.cell),
       |t AS (SELECT CAST(sum(n_current) AS BIGINT) AS tc,
       |    CAST(sum(n_baseline) AS BIGINT) AS tb FROM j)
       |SELECT cell, n_current, n_baseline,
       |  CASE WHEN n_baseline > 0 AND tc > 0
       |    THEN $exp ELSE NULL END AS expected,
       |  CASE WHEN n_baseline > 0 AND tc > 0
       |    THEN (CAST(n_current AS DOUBLE) - $exp)
       |      * (CAST(n_current AS DOUBLE) - $exp) / ($exp)
       |    ELSE NULL END AS chi2_contribution,
       |  n_baseline = 0 AS new_category
       |FROM j CROSS JOIN t""".stripMargin
  }

  // ---------------------------------------------------------------
  // q63 — line-level corpus dedup (C4-style boilerplate removal).
  // The synthetic corpus has no repeated lines, so the query plants
  // deterministic chrome — a header on every document, a footer on
  // even ids — with the identical expression in both engines, then
  // strips lines whose document frequency exceeds the threshold.
  // Original lines (df = 1) survive byte-identically, order intact.
  // ---------------------------------------------------------------
  private val BoilerplateHeader = "GRAFT CORPUS HEADER v1"
  private val BoilerplateFooter = "Subscribe to our newsletter for updates"
  private val BoilerplateMaxDf = 10L

  def q63LineDedup(spark: SparkSession, d: String): DataFrame = {
    val planted = Tables.documents(spark, d).select(col("doc_id"),
      concat(lit(BoilerplateHeader), lit("\n"), col("text"),
        when(col("doc_id") % 2 === 0,
          lit("\n" + BoilerplateFooter)).otherwise(lit(""))).as("text"))
    graft.operators.Dedup.dropBoilerplateLines(
      planted, "doc_id", "text", BoilerplateMaxDf)
  }

  val q63Sql: String =
    s"""WITH base AS (SELECT doc_id,
       |    '$BoilerplateHeader' || chr(10) || text ||
       |    CASE WHEN doc_id % 2 = 0 THEN chr(10) || '$BoilerplateFooter' ELSE '' END AS text
       |  FROM documents),
       |lines AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM (
       |    SELECT doc_id,
       |      unnest([{'pos': i, 'line': s[i]} for i in range(1, len(s) + 1)]) AS u
       |    FROM (SELECT doc_id, string_split(text, chr(10)) AS s FROM base))),
       |hot AS (SELECT line FROM (
       |    SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY line)
       |  WHERE df > $BoilerplateMaxDf),
       |kept AS (SELECT l.doc_id, l.pos, l.line
       |  FROM lines l LEFT JOIN hot h USING (line) WHERE h.line IS NULL),
       |reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
       |    CAST(count(*) AS BIGINT) AS n_lines_kept
       |  FROM kept GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST(len(string_split(text, chr(10))) AS BIGINT) AS total
       |  FROM base)
       |SELECT t.doc_id,
       |  coalesce(r.clean_text, '') AS clean_text,
       |  coalesce(r.n_lines_kept, CAST(0 AS BIGINT)) AS n_lines_kept,
       |  t.total - coalesce(r.n_lines_kept, CAST(0 AS BIGINT)) AS n_lines_dropped
       |FROM tot t LEFT JOIN reb r USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------
  // q59 — kNN label agreement (embedding-space label-noise / class-
  // purity diagnostic): per query label, how many of each query's 3
  // nearest corpus neighbors share the label. Counts only — exact
  // integers hash-match; a mean like k/3 would be order-sensitive.
  // ---------------------------------------------------------------
  def q59LabelPurity(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    Similarity.knnLabelAgreement(
      queries = emb.filter(col("vec_id") % QueryMod === 0),
      corpus = emb.filter(col("vec_id") % QueryMod =!= 0),
      idCol = "vec_id", vecCol = "embedding", labelCol = "label", k = AnnK)
  }

  val q59Sql: String = {
    def dot(a: String, b: String) =
      s"""list_sum(list_transform(range(1, 65),
         |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS q_label
       |  FROM embeddings WHERE vec_id % $QueryMod = 0),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS n_label
       |  FROM embeddings WHERE vec_id % $QueryMod <> 0),
       |s AS (SELECT query_id, q_label, n_label, neighbor_id,
       |    ${dot("cv", "qv")} /
       |    (sqrt(${dot("cv", "cv")}) * sqrt(${dot("qv", "qv")})) AS cosine
       |  FROM c, q),
       |r AS (SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM s)
       |SELECT q_label AS label,
       |  CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
       |  CAST(count(*) AS BIGINT) AS n_neighbors,
       |  CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_agreeing
       |FROM r WHERE rn <= $AnnK GROUP BY q_label""".stripMargin
  }

  // ---------------------------------------------------------------
  // q92 — kNN label agreement through the IVF plan: q59's diagnostic
  // with q58's candidate machinery. Candidates come from the sampled-
  // centroid cell equi-join (never O(|Q|·corpus)); labels ride the
  // candidate rows. Every step is portable double arithmetic, so
  // DuckDB replays the whole approximate pipeline and the counts
  // hash-match — the brute/IVF pair (q59/q92) mirrors q44/q58.
  // Cost note (same as q58 vs q44): at sf0.1 the IVF variant is
  // SLOWER than brute (~2.8 s vs ~1.0 s warm) because the per-row
  // centroid assignment scan dominates while the corpus is small;
  // the shapes cross at scale, where scoring nprobe/nlist of the
  // pairs beats scoring all of them and the cell key partition-prunes
  // at rest. q92 exists to keep that scale path oracle-pinned and
  // bench-visible, not to win at this SF.
  // ---------------------------------------------------------------
  def q92LabelPurityIvf(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    Similarity.knnLabelAgreementIvf(
      queries = emb.filter(col("vec_id") % QueryMod === 0),
      corpus = emb.filter(col("vec_id") % QueryMod =!= 0),
      idCol = "vec_id", vecCol = "embedding", labelCol = "label", k = AnnK,
      nlist = IvfNlist, nprobe = IvfNprobe)
  }

  val q92Sql: String = {
    def dot(a: String, b: String) =
      s"""list_sum(list_transform(range(1, 65),
         |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin
    def cos(a: String, b: String) =
      s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    s"""WITH corpus AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS n_label
       |  FROM embeddings WHERE vec_id % $QueryMod <> 0),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, label AS q_label
       |  FROM embeddings WHERE vec_id % $QueryMod = 0),
       |cents AS (SELECT CAST(row_number() OVER (ORDER BY neighbor_id) - 1 AS INT) AS c, cv AS ct
       |  FROM (SELECT neighbor_id, cv FROM corpus ORDER BY neighbor_id LIMIT $IvfNlist)),
       |assigned AS (SELECT neighbor_id, cv, n_label, cell FROM (
       |    SELECT neighbor_id, cv, n_label, c AS cell,
       |      row_number() OVER (PARTITION BY neighbor_id
       |        ORDER BY ${cos("cv", "ct")} DESC, c DESC) AS ar
       |    FROM corpus CROSS JOIN cents) WHERE ar = 1),
       |probes AS (SELECT query_id, qv, q_label, cell FROM (
       |    SELECT q.query_id, q.qv, q.q_label, cents.c AS cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cos("qv", "ct")} DESC, c DESC) AS pr
       |    FROM q CROSS JOIN cents) WHERE pr <= $IvfNprobe),
       |scored AS (SELECT p.query_id, p.q_label, a.n_label, a.neighbor_id,
       |    ${cos("cv", "qv")} AS cosine
       |  FROM assigned a JOIN probes p ON a.cell = p.cell),
       |r AS (SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM scored)
       |SELECT q_label AS label,
       |  CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
       |  CAST(count(*) AS BIGINT) AS n_neighbors,
       |  CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_agreeing
       |FROM r WHERE rn <= $AnnK GROUP BY q_label""".stripMargin
  }

  // ---------------------------------------------------------------
  // q123 — hard-negative mining: per query vector, the 3 most-similar
  // DIFFERENT-label corpus rows through the q92 IVF candidate plan
  // (label filter BEFORE the top-k, so every slot is a negative).
  // The contrastive-training companion to q121's random negatives;
  // fully oracle-replayed like q58/q92.
  // ---------------------------------------------------------------
  def q123HardNegatives(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    Similarity.hardNegativesIvf(
      queries = emb.filter(col("vec_id") % QueryMod === 0),
      corpus = emb.filter(col("vec_id") % QueryMod =!= 0),
      idCol = "vec_id", vecCol = "embedding", labelCol = "label", k = AnnK,
      nlist = IvfNlist, nprobe = IvfNprobe)
  }

  val q123Sql: String = {
    def dot(a: String, b: String) =
      s"""list_sum(list_transform(range(1, 65),
         |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin
    def cos(a: String, b: String) =
      s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    s"""WITH corpus AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS n_label
       |  FROM embeddings WHERE vec_id % $QueryMod <> 0),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, label AS q_label
       |  FROM embeddings WHERE vec_id % $QueryMod = 0),
       |cents AS (SELECT CAST(row_number() OVER (ORDER BY neighbor_id) - 1 AS INT) AS c, cv AS ct
       |  FROM (SELECT neighbor_id, cv FROM corpus ORDER BY neighbor_id LIMIT $IvfNlist)),
       |assigned AS (SELECT neighbor_id, cv, n_label, cell FROM (
       |    SELECT neighbor_id, cv, n_label, c AS cell,
       |      row_number() OVER (PARTITION BY neighbor_id
       |        ORDER BY ${cos("cv", "ct")} DESC, c DESC) AS ar
       |    FROM corpus CROSS JOIN cents) WHERE ar = 1),
       |probes AS (SELECT query_id, qv, q_label, cell FROM (
       |    SELECT q.query_id, q.qv, q.q_label, cents.c AS cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${cos("qv", "ct")} DESC, c DESC) AS pr
       |    FROM q CROSS JOIN cents) WHERE pr <= $IvfNprobe),
       |scored AS (SELECT p.query_id, p.q_label, a.n_label, a.neighbor_id,
       |    ${cos("cv", "qv")} AS cosine
       |  FROM assigned a JOIN probes p ON a.cell = p.cell
       |  -- IS DISTINCT FROM = the engine's !(n_label <=> q_label):
       |  -- a NULL-label neighbor IS a negative for a labeled query
       |  -- (and vice versa); only null-vs-null is same-label
       |  WHERE a.n_label IS DISTINCT FROM p.q_label),
       |r AS (SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM scored)
       |SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id, cosine,
       |  q_label AS query_label, n_label AS neighbor_label
       |FROM r WHERE rn <= $AnnK""".stripMargin
  }

  // ---------------------------------------------------------------
  // q135 — retrieval-quality eval of the IVF index against brute
  // ground truth: the q58 run scored against the q44 top-k as the
  // relevant set, per query — hits, precision@k, recall@k, first
  // relevant rank, reciprocal rank, AND nDCG@k against brute-graded
  // gains (k+1−rank ∈ {3,2,1}) in one report. THE operational
  // questions for an approximate index ("how much recall did
  // nprobe=4/16 cost, and did it rank what it kept?") as one
  // oracle-pinned surface; both pipelines are fully DuckDB-
  // replayable, so the eval of an approximate run is itself exact.
  // The run and truth frames are persisted and shared by both
  // operators — one brute scan and one IVF probe per report, however
  // many metrics read them. nDCG discounts are 10¹²-quantized
  // integer literals (one Scala computation interpolated into BOTH
  // engines — the PoissonOneCdf shared-literal discipline), so each
  // query's DCG/IDCG is an exact integer.
  // ---------------------------------------------------------------
  def q135RetrievalQuality(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val run = q58AnnIvf(spark, d).persistFresh()
    // the brute-force ground truth is a materialized-table read
    // (QueryFixtures, r10 verdict item 1): in production the truth
    // set is labeled ONCE and evaluated against many index configs —
    // rebuilding the all-pairs brute scan inside the timed region
    // made the bench time the fixture, not the index eval. persisted
    // because both metric operators (retrievalQuality, ndcgAtK) read
    // it. The oracle still states the full brute-force SQL (q44).
    val truth = QueryFixtures.ensure(spark, d, "q135_truth", "q135_retrieval_quality")(q44AnnJoin(spark, d))
      .persistFresh()
    val rq = Ranking.retrievalQuality(run,
      truth.select(col("query_id"), col("neighbor_id")),
      "query_id", "neighbor_id", "cosine", k = AnnK)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val graded = truth.withColumn("gain",
      (lit(AnnK + 1) - row_number().over(w)).cast("long"))
    val nd = Ranking.ndcgAtK(run, graded,
      "query_id", "neighbor_id", "cosine", "gain", k = AnnK)
    val out = rq.join(nd, Seq("query_id"))
    graft.CacheLifecycle.releaseWhenExecuted(out, Seq(run, truth))
    out
  }

  val q135Sql: String = {
    val disc = Ranking.discountsQ(AnnK)
    def discCase(rankExpr: String): String =
      disc.zipWithIndex.map { case (d0, i) =>
        s"WHEN $rankExpr = ${i + 1} THEN CAST($d0 AS DECIMAL(38,0))"
      }.mkString("CASE ", " ", " ELSE CAST(0 AS DECIMAL(38,0)) END")
    s"""WITH run AS ($q58Sql), tr AS ($q44Sql),
       |rel AS (SELECT DISTINCT query_id, neighbor_id FROM tr),
       |rq AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
       |  FROM rel GROUP BY query_id),
       |rk AS (SELECT query_id, neighbor_id, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM run),
       |rk3 AS (SELECT * FROM rk WHERE rnk <= $AnnK),
       |h AS (SELECT rk3.query_id, CAST(COUNT(*) AS BIGINT) AS n_ret,
       |    CAST(SUM(CASE WHEN rel.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |    CAST(MIN(CASE WHEN rel.neighbor_id IS NOT NULL THEN rnk END) AS BIGINT) AS first_rel_rank
       |  FROM rk3 LEFT JOIN rel ON rk3.query_id = rel.query_id
       |    AND rk3.neighbor_id = rel.neighbor_id
       |  GROUP BY rk3.query_id),
       |g AS (SELECT query_id, neighbor_id,
       |    CAST(${AnnK + 1} - row_number() OVER (
       |      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS gain
       |  FROM tr),
       |dcg AS (SELECT rk3.query_id,
       |    CAST(SUM(CAST(COALESCE(g.gain, 0) AS DECIMAL(38,0))
       |      * ${discCase("rk3.rnk")}) AS BIGINT) AS dcg_q
       |  FROM rk3 LEFT JOIN g ON rk3.query_id = g.query_id
       |    AND rk3.neighbor_id = g.neighbor_id
       |  GROUP BY rk3.query_id),
       |ideal AS (SELECT query_id, gain, row_number() OVER (
       |    PARTITION BY query_id ORDER BY gain DESC, neighbor_id) AS irank
       |  FROM g),
       |idcg AS (SELECT query_id,
       |    CAST(SUM(CAST(gain AS DECIMAL(38,0)) * ${discCase("irank")}) AS BIGINT) AS idcg_q
       |  FROM ideal WHERE irank <= $AnnK GROUP BY query_id)
       |SELECT rq.query_id, rq.n_rel,
       |  COALESCE(h.n_ret, 0) AS n_ret, COALESCE(h.hits, 0) AS hits,
       |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / ${AnnK}.0 AS precision_at_k,
       |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST(rq.n_rel AS DOUBLE) AS recall_at_k,
       |  h.first_rel_rank,
       |  CASE WHEN h.first_rel_rank IS NOT NULL
       |    THEN 1.0 / CAST(h.first_rel_rank AS DOUBLE) END AS rr,
       |  COALESCE(dcg.dcg_q, 0) AS dcg_q, idcg.idcg_q,
       |  CASE WHEN idcg.idcg_q > 0 THEN
       |    CAST(COALESCE(dcg.dcg_q, 0) AS DOUBLE) / CAST(idcg.idcg_q AS DOUBLE)
       |  END AS ndcg
       |FROM rq LEFT JOIN h ON rq.query_id = h.query_id
       |JOIN idcg ON rq.query_id = idcg.query_id
       |LEFT JOIN dcg ON rq.query_id = dcg.query_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // q60 — schema-on-read over the events JSON payload: one codegen'd
  // from_json parse per row projects props.k typed, then a grouped
  // integer census. The semi-structured-column bridge pattern.
  // ---------------------------------------------------------------
  def q60JsonProps(spark: SparkSession, d: String): DataFrame =
    SemiStructured.extractJson(
        Tables.events(spark, d).select(col("event_type"), col("props")),
        "props", "k INT")
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_k"),
        sum(col("k").cast("long")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  val q60Sql: String =
    """SELECT event_type,
      |  CAST(count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS n_k,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q45 — BM25-family keyword retrieval: top-20 documents for a fixed
  // term set. The idf is the plain ratio N/df (no log) so every
  // operation is IEEE +,*,/ in a fixed association — the oracle
  // reproduces the double arithmetic bit-for-bit. SQL is generated
  // from the same constants as the Spark plan.
  // ---------------------------------------------------------------
  private val Bm25Terms = Seq("spark", "merge", "vector")
  private val Bm25K = 20
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  def q45Bm25(spark: SparkSession, d: String): DataFrame =
    Retrieval.bm25TopK(Tables.documents(spark, d), "doc_id", "text",
      Bm25Terms, k = Bm25K, k1 = Bm25K1, b = Bm25B)

  val q45Sql: String = {
    val toks = "regexp_extract_all(lower(text), '\\S+')"
    val tfs = Bm25Terms.zipWithIndex.map { case (term, i) =>
      s"CAST(len(list_filter($toks, x -> x = '$term')) AS BIGINT) AS _tf$i"
    }.mkString(",\n    ")
    val dfs = Bm25Terms.indices.map(i =>
      s"CAST(sum(CASE WHEN _tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS _df$i")
      .mkString(",\n    ")
    // literals stringified from the SAME Scala doubles the plan uses:
    // shortest-round-trip repr parses back to the identical double
    val avglen = "(CAST(_sumlen AS DOUBLE) / CAST(_n AS DOUBLE))"
    val termScores = Bm25Terms.indices.map { i =>
      s"""(CASE WHEN _df$i > 0 AND _tf$i > 0
         |    THEN (CAST(_n AS DOUBLE) / CAST(_df$i AS DOUBLE))
         |      * (CAST(_tf$i AS DOUBLE) * ${Bm25K1 + 1.0})
         |      / (CAST(_tf$i AS DOUBLE) + ${Bm25K1}
         |         * (${1.0 - Bm25B} + ${Bm25B} * CAST(_len AS DOUBLE) / $avglen))
         |    ELSE 0.0 END)""".stripMargin
    }.mkString("\n  + ")
    val outTfs = Bm25Terms.zipWithIndex
      .map { case (term, i) => s"_tf$i AS tf_$term" }.mkString(", ")
    s"""WITH pd AS (SELECT doc_id,
       |    CAST(len($toks) AS BIGINT) AS _len,
       |    $tfs
       |  FROM documents),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS _n,
       |    CAST(sum(_len) AS BIGINT) AS _sumlen,
       |    $dfs
       |  FROM pd)
       |SELECT doc_id,
       |  $termScores AS score,
       |  $outTfs
       |FROM pd CROSS JOIN st
       |ORDER BY score DESC, doc_id LIMIT $Bm25K""".stripMargin
  }

  // ---------------------------------------------------------------
  // q49 — per-file manifest (row count + column min/max), the
  // data-skipping statistics a lakehouse keeps. File identity comes
  // from the scan's _metadata struct; the oracle pins the stats math
  // (the sf inputs are single-file tables, so the basename is a
  // constant there — the multi-file case is spec-pinned against the
  // 30-file partitioned events layout).
  // ---------------------------------------------------------------
  def q49FileManifest(spark: SparkSession, d: String): DataFrame =
    graft.operators.Provenance.fileManifest(
        Tables.lineitem(spark, d), Seq("l_orderkey", "l_shipdate"))
      // absolute paths can't appear in a fixed oracle; the basename is
      // a constant for the single-file sf tables
      .drop("file_path")

  val q49Sql: String =
    """SELECT 'lineitem.parquet' AS file_name,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  min(l_orderkey) AS min_l_orderkey, max(l_orderkey) AS max_l_orderkey,
      |  min(l_shipdate) AS min_l_shipdate, max(l_shipdate) AS max_l_shipdate
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------
  // q50 — CDC log compaction: current snapshot per user from the
  // events change log — latest event wins (ts, then event_id, both
  // descending: a TOTAL order, ties would make "current"
  // nondeterministic), and a key whose latest event is an error
  // tombstone drops out of the snapshot entirely.
  // ---------------------------------------------------------------
  def q50LatestSnapshot(spark: SparkSession, d: String): DataFrame =
    graft.operators.Snapshot.latestSnapshot(
        Tables.events(spark, d), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc),
        tombstone = Some(col("event_type") === "error"))
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("ts").as("last_ts"), col("event_type").as("last_type"),
        col("value").as("last_value"))

  val q50Sql: String =
    """SELECT user_id, event_id AS last_event_id, ts AS last_ts,
      |  event_type AS last_type, value AS last_value
      |FROM (SELECT *, row_number() OVER (
      |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 AND event_type <> 'error'""".stripMargin

  // ---------------------------------------------------------------
  // q51 — range join: every event falling inside any 10-minute
  // incident window (spawned by error events of low-id users). The
  // naive non-equi join is a nested loop over |P|·|I|; the operator
  // bins both sides so it runs as an equi-join on the bin key
  // (plan-pinned: no BroadcastNestedLoopJoin). The oracle states the
  // plain BETWEEN join — same result, DuckDB-sized input.
  // ---------------------------------------------------------------
  private val WindowMicros = 600000000L // 10 minutes

  def q51RangeJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val points = ev.select(col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("pt"))
    val windows = ev.filter(col("event_type") === "error" && col("user_id") < 5)
      .select(col("event_id").as("window_id"),
        unix_micros(col("ts")).as("w_start"),
        (unix_micros(col("ts")) + lit(WindowMicros)).as("w_end"))
    graft.operators.RangeJoin.pointInInterval(
        points, "pt", windows, "w_start", "w_end", binWidth = WindowMicros)
      .select(col("window_id"), col("event_id"), col("event_type"))
  }

  val q51Sql: String =
    s"""WITH w AS (SELECT event_id AS window_id,
       |    epoch_us(ts) AS ws, epoch_us(ts) + $WindowMicros AS we
       |  FROM events WHERE event_type = 'error' AND user_id < 5)
       |SELECT window_id, e.event_id, e.event_type
       |FROM events e JOIN w ON epoch_us(e.ts) BETWEEN ws AND we""".stripMargin

  // ---------------------------------------------------------------
  // q67 — Bloom-prefiltered decontamination: SAME exact semantics as
  // q42 (the oracle is q42's SQL with n=6, minOverlap=2), different
  // 100 TB plan — a broadcast Bloom sketch drops non-colliding corpus
  // shingles map-side, and the surviving sliver confirms against the
  // exact benchmark set with a shuffle semi-join (nothing corpus- or
  // benchmark-scale is ever broadcast exactly). Bloom has no false
  // negatives and the confirm join kills false positives, so the
  // result is exact — which is exactly why it CAN be oracle-checked.
  // ---------------------------------------------------------------
  private val BloomN = 6
  private val BloomMinOverlap = 2L

  def q67BloomDecontam(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    Decontamination.contaminationReportBloom(
      corpus = docs.filter(col("doc_id") % BenchMod =!= 0),
      bench = docs.filter(col("doc_id") % BenchMod === 0),
      idCol = "doc_id", textCol = "text",
      n = BloomN, minOverlap = BloomMinOverlap, fpp = 0.01)
  }

  val q67Sql: String = {
    val h = (s: String) =>
      s"CAST(CAST(('0x' || substr(md5($s), 1, 15)) AS UBIGINT) AS BIGINT)"
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    CASE WHEN len(w) >= $BloomN
       |      THEN list_transform(range(1, len(w) - $BloomN + 2),
       |             i -> array_to_string(w[i:i+${BloomN - 1}], ' '))
       |      ELSE [] END)) AS s
       |  FROM tok),
       |bench AS (SELECT DISTINCT ${h("s")} AS h FROM sh WHERE doc_id % $BenchMod = 0),
       |corp AS (SELECT doc_id, ${h("s")} AS h FROM sh WHERE doc_id % $BenchMod <> 0)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
       |FROM corp JOIN bench USING (h)
       |GROUP BY doc_id HAVING count(*) >= $BloomMinOverlap""".stripMargin
  }

  // ---------------------------------------------------------------
  // q76 — takedown plan: which files must be rewritten to purge a
  // given id manifest (every 97th doc here), and how hard each is
  // hit. File identity from _metadata as in q49; the sf tables are
  // single-file, so the basename is the oracle constant (the
  // multi-file case is spec-pinned on a partitioned layout).
  // ---------------------------------------------------------------
  def q76TakedownPlan(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    graft.operators.Provenance.takedownPlan(
        docs, "doc_id",
        docs.filter(col("doc_id") % 97 === 0).select(col("doc_id")))
      .drop("file_path")
  }

  val q76Sql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  CAST(sum(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS hit_fraction,
      |  'documents.parquet' AS file_name
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------
  // q105 — incremental aggregate maintenance: the query path splits
  // events at mid-month, builds per-(type, day) PARTIALS for each
  // half independently, merges, and rolls up per type — while the
  // oracle aggregates the raw table directly in one pass. Equality
  // IS the maintenance contract: append-only partials replace
  // history rescans. Weights are cent-quantized (the q100
  // convention) so sums stay integer-exact in any merge order.
  // ---------------------------------------------------------------
  private val IncrCutoffUs = 1705363200000000L // 2024-01-16T00:00:00Z

  def q105IncrementalTotals(spark: SparkSession, d: String): DataFrame = {
    import graft.operators.Incremental
    val ev = Tables.events(spark, d)
    val w = bround(col("value") * 100).cast("long")
    def partials(p: org.apache.spark.sql.Column) =
      Incremental.bucketPartials(
        ev.filter(p), col("event_type"), col("ts"), w, 86400L)
    val us = unix_micros(col("ts"))
    Incremental.keyTotals(Incremental.mergePartials(
      partials(us < IncrCutoffUs), partials(us >= IncrCutoffUs)))
  }

  val q105Sql: String =
    """SELECT event_type AS key, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(round_even(value * 100, 0) AS BIGINT)) AS BIGINT) AS w_sum
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q165 — SEMANTIC decontamination report: corpus vectors whose best
  // cosine against the benchmark split (vec_id % 20 = 0, the q44
  // convention) reaches 0.35 — the embedding-space complement of
  // q42's n-gram screen (paraphrases share no shingles). Threshold
  // filter is map-side BEFORE any shuffle; the argmax window sees
  // only contaminated candidates.
  // ---------------------------------------------------------------
  private val SemThreshold = 0.35

  def q165SemanticDecontam(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
    graft.operators.Decontamination.semanticContaminationReport(
      corpus = emb.filter(col("vec_id") % QueryMod =!= 0),
      bench = emb.filter(col("vec_id") % QueryMod === 0),
      idCol = "vec_id", vecCol = "embedding", threshold = SemThreshold)
  }

  val q165Sql: String = {
    def dot(a: String, b: String) =
      s"""list_sum(list_transform(range(1, 65),
         |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin
    s"""WITH b AS (SELECT vec_id AS bench_id, embedding AS bv
       |  FROM embeddings WHERE vec_id % $QueryMod = 0),
       |c AS (SELECT vec_id AS corpus_id, embedding AS cv
       |  FROM embeddings WHERE vec_id % $QueryMod <> 0),
       |s AS (SELECT corpus_id, bench_id,
       |    ${dot("cv", "bv")} /
       |    (sqrt(${dot("cv", "cv")}) * sqrt(${dot("bv", "bv")})) AS cosine
       |  FROM c, b),
       |f AS (SELECT * FROM s WHERE cosine >= $SemThreshold)
       |SELECT corpus_id AS vec_id, bench_id, cosine FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY corpus_id ORDER BY cosine DESC, bench_id) AS rn
       |  FROM f) WHERE rn = 1""".stripMargin
  }

  /** Fixture-backed bench rows (see EvalQueries.fixtureBacked):
    * q135's first invocation materializes the q135_truth fixture. */
  val fixtureBacked: Seq[String] =
    Seq("q135_retrieval_quality", "q209_ann_ivf_auto",
      "q219_ann_ivf_assigned", "q220_ann_ivf_grown",
      "q221_label_purity_ivf_assigned", "q222_hard_negatives_assigned",
      "q223_retrieval_quality_assigned", "q224_codebook_drift")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q105_incremental_totals" -> (q105IncrementalTotals _),
    "q165_semantic_decontam" -> (q165SemanticDecontam _),
    "q67_bloom_decontam" -> (q67BloomDecontam _),
    "q42_decontamination" -> (q42Decontamination _),
    "q43_pii_redaction" -> (q43PiiRedaction _),
    "q44_ann_join" -> (q44AnnJoin _),
    "q58_ann_ivf" -> (q58AnnIvf _),
    "q209_ann_ivf_auto" -> (q209AnnIvfAuto _),
    "q219_ann_ivf_assigned" -> (q219AnnIvfAssigned _),
    "q220_ann_ivf_grown" -> (q220AnnIvfGrown _),
    "q221_label_purity_ivf_assigned" -> (q221LabelPurityIvfAssigned _),
    "q222_hard_negatives_assigned" -> (q222HardNegativesAssigned _),
    "q223_retrieval_quality_assigned" -> (q223RetrievalQualityAssigned _),
    "q224_codebook_drift" -> (q224CodebookDrift _),
    "q59_label_purity" -> (q59LabelPurity _),
    "q92_label_purity_ivf" -> (q92LabelPurityIvf _),
    "q123_hard_negatives" -> (q123HardNegatives _),
    "q135_retrieval_quality" -> (q135RetrievalQuality _),
    "q60_json_props" -> (q60JsonProps _),
    "q63_line_dedup" -> (q63LineDedup _),
    "q45_bm25_retrieval" -> (q45Bm25 _),
    "q49_file_manifest" -> (q49FileManifest _),
    "q76_takedown_plan" -> (q76TakedownPlan _),
    "q50_latest_snapshot" -> (q50LatestSnapshot _),
    "q51_range_join" -> (q51RangeJoin _))

  val oracleSql: Map[String, String] = Map(
    "q105_incremental_totals" -> q105Sql,
    "q165_semantic_decontam" -> q165Sql,
    "q67_bloom_decontam" -> q67Sql,
    "q42_decontamination" -> q42Sql,
    "q43_pii_redaction" -> q43Sql,
    "q44_ann_join" -> q44Sql,
    "q58_ann_ivf" -> q58Sql,
    "q209_ann_ivf_auto" -> q209Sql,
    "q219_ann_ivf_assigned" -> q209Sql,
    "q220_ann_ivf_grown" -> q209Sql,
    "q221_label_purity_ivf_assigned" -> q92Sql,
    "q222_hard_negatives_assigned" -> q123Sql,
    "q223_retrieval_quality_assigned" -> q135Sql,
    "q224_codebook_drift" -> q224Sql,
    "q59_label_purity" -> q59Sql,
    "q92_label_purity_ivf" -> q92Sql,
    "q123_hard_negatives" -> q123Sql,
    "q135_retrieval_quality" -> q135Sql,
    "q60_json_props" -> q60Sql,
    "q63_line_dedup" -> q63Sql,
    "q45_bm25_retrieval" -> q45Sql,
    "q49_file_manifest" -> q49Sql,
    "q76_takedown_plan" -> q76Sql,
    "q50_latest_snapshot" -> q50Sql,
    "q51_range_join" -> q51Sql)
}
