package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, Skew}

class SkewIvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedDistinctCount equals plain count_distinct on a skewed key") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    val plain = li.groupBy("l_returnflag")
      .agg(count_distinct($"l_orderkey").as("distinct_count"))
    val salted = Skew.saltedDistinctCount(li, Seq("l_returnflag"), "l_orderkey", 8)
    assert(plain.exceptAll(salted).count() == 0 &&
      salted.exceptAll(plain).count() == 0)
  }

  test("saltedJoin equals plain join") {
    val orders = Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, TestSpark.sf)
      .withColumnRenamed("c_custkey", "o_custkey")
      .select("o_custkey", "c_name")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
    val salted = Skew.saltedJoin(orders, customer, Seq("o_custkey"),
        $"o_orderkey", 4)
      .select("o_orderkey", "c_name")
    assert(plain.exceptAll(salted).count() == 0 &&
      salted.exceptAll(plain).count() == 0)
  }

  test("AQE skew-join splits the hot key at runtime; saltedJoin matches it structurally") {
    // A hot key that dwarfs the median partition: ~60% of the fact
    // side lands on k=0. AQE's skew split and the manual salted join
    // must both produce the plain join's exact result; the spec also
    // pins that AQE actually ENGAGED (skew=true in the final plan) so
    // the demonstration can't silently degrade into an ordinary SMJ.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-scale thresholds: the defaults (256 MB) never fire at
      // spec volume; production leaves them alone
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // suppress broadcast so the join is a genuine shuffle SMJ —
      // the only shape AQE skew-splits
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val facts = spark.range(0, 150000).selectExpr(
        "CASE WHEN id % 10 < 6 THEN CAST(0 AS BIGINT) ELSE id % 1000 END AS k",
        "id AS fact_id", "repeat('p', 32) AS pad")
      val dim = spark.range(0, 1000).selectExpr(
        "id AS k", "concat('dim-', id) AS name")
      def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.selectExpr("xxhash64(fact_id, name) AS h")
          .agg(count(lit(1)), bit_xor($"h")).head()
        (r.getLong(0), r.getLong(1))
      }
      val aqe = facts.join(dim, "k").select($"fact_id", $"name")
      val aqeFp = fingerprint(aqe)
      // fingerprint() executed a derived plan; run the join itself so
      // ITS adaptive plan finalizes, then pin the skew split engaged
      aqe.collect()
      val planStr = aqe.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true"),
        s"AQE must have split the hot partition (skew=true):\n$planStr")
      val salted = Skew
        .saltedJoin(facts, dim, Seq("k"), $"fact_id", 8)
        .select($"fact_id", $"name")
      assert(fingerprint(salted) == aqeFp,
        "salted and AQE-split joins must produce the identical result")
      assert(aqeFp._1 == 150000L, "inner join keeps every fact row (dim is total on k)")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("ivfTopK: true cosines from probed cells, sorted; decent recall") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val rest = emb.filter($"vec_id" =!= 0)
    val ivf = Similarity.ivfTopK(rest, "vec_id", "embedding", q, 10,
      nlist = 16, nprobe = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(ivf.nonEmpty)
    // values are the exact cosines (probing prunes candidates, never alters scores)
    val all = Similarity.bruteForceTopK(rest, "vec_id", "embedding", q, Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach { case (id, c) => assert(math.abs(all(id) - c) < 1e-12) }
    assert(ivf.map(_._2).toSeq == ivf.map(_._2).toSeq.sorted.reverse)
    val brute10 = Similarity.bruteForceTopK(rest, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.map(_._1).toSet.intersect(brute10).size >= 2)
  }

  test("autoNlist: smallest power of two with p*p >= n, capped; auto IVF == explicit at the derived value") {
    import graft.operators.Similarity
    // the integer rule at its boundaries
    assert(Similarity.autoNlist(0) == 1)
    assert(Similarity.autoNlist(1) == 1)
    assert(Similarity.autoNlist(2) == 2)
    assert(Similarity.autoNlist(4) == 2)
    assert(Similarity.autoNlist(5) == 4)
    assert(Similarity.autoNlist(16) == 4)
    assert(Similarity.autoNlist(17) == 8)
    assert(Similarity.autoNlist(5700) == 128)
    assert(Similarity.autoNlist(57000) == 256)
    assert(Similarity.autoNlist(Long.MaxValue) == 256, "cap binds")
    assert(Similarity.autoNlist(Long.MaxValue, cap = 1024) == 1024)
    // nlist = 0 resolves to autoNlist(corpus count) and produces the
    // IDENTICAL result to passing that value explicitly
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" % 20 === 0)
    val c = emb.filter($"vec_id" % 20 =!= 0)
    val derived = Similarity.autoNlist(c.count())
    val auto = Similarity.annJoinIvfSampled(
      q, c, "vec_id", "embedding", k = 3, nlist = 0, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val explicit = Similarity.annJoinIvfSampled(
      q, c, "vec_id", "embedding", k = 3, nlist = derived, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(auto == explicit && auto.nonEmpty)
    // nprobe larger than the resolved nlist clamps instead of failing
    val clamped = Similarity.annJoinIvfSampled(
      q, c, "vec_id", "embedding", k = 3, nlist = 2, nprobe = 64)
    assert(clamped.count() > 0)
  }

  test("annJoinIvfCentroids: centroid-TABLE variant == literal-sampled variant; works past the literal cap") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" % 20 === 0)
    val c = emb.filter($"vec_id" % 20 =!= 0)
    // the sampled variant's centroid set, materialized AS A TABLE:
    // id-ordered first nlist corpus vectors, cell = sample position
    def centTable(nlist: Int) = {
      val rows = c.orderBy($"vec_id").limit(nlist)
        .select($"embedding").collect()
        .zipWithIndex.map { case (r, i) =>
          (i, r.getSeq[Float](0).map(_.toDouble)) }.toSeq
      rows.toDF("cell", "centroid")
    }
    val viaTable = Similarity.annJoinIvfCentroids(
      q, c, centTable(16), "vec_id", "embedding", k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaLiterals = Similarity.annJoinIvfSampled(
      q, c, "vec_id", "embedding", k = 3, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaTable == viaLiterals,
      "table-centroid IVF must equal the literal variant bit-for-bit on a shared centroid set")
    assert(viaTable.nonEmpty)
    // past the literal-expression cap: 512 cells works as data (the
    // literal form would inline 512×64 array literals)
    val big = Similarity.annJoinIvfCentroids(
      q, c, centTable(512), "vec_id", "embedding", k = 3, nprobe = 8)
    val perQuery = big.groupBy($"query_id").count().collect()
    assert(perQuery.nonEmpty && perQuery.forall(_.getLong(1) <= 3))
    // cosines are exact (probing prunes candidates, never alters
    // scores): every reported cosine matches the brute pair score
    val brute = Similarity.annJoinBrute(
      q, c, "vec_id", "embedding", k = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    big.collect().foreach { r =>
      assert(brute((r.getLong(0), r.getLong(1))) == r.getDouble(2))
    }
    // duplicate cell ids are refused loudly
    intercept[IllegalArgumentException] {
      Similarity.annJoinIvfCentroids(q, c,
        Seq((0, Seq(1.0)), (0, Seq(2.0))).toDF("cell", "centroid"),
        "vec_id", "embedding", k = 3, nprobe = 4)
    }
  }

  test("annJoinIvfAssigned: stored-assignment path == recompute path; stale store refused") {
    // The materialized (id, vec, cell) assignment — the ANN analog of
    // the dedup band store: assigned once against the codebook,
    // written partitioned by cell, consumed per query without the
    // corpus-wide argmax. Must equal the recompute form bit-for-bit.
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" % 20 === 0)
    val c = emb.filter($"vec_id" % 20 =!= 0)
    val cents = c.orderBy($"vec_id").limit(16)
      .select($"embedding").collect()
      .zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Float](0).map(_.toDouble)) }.toSeq
      .toDF("cell", "centroid")
    val store = java.nio.file.Files
      .createTempDirectory("ivf_assigned").toString
    Similarity.ivfCellAssignments(c, cents, "vec_id", "embedding")
      .write.mode("overwrite").partitionBy("cell").parquet(store)
    val fromStore = Similarity.annJoinIvfAssigned(
      q, spark.read.parquet(store), cents,
      "vec_id", "embedding", k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val recomputed = Similarity.annJoinIvfCentroids(
      q, c, cents, "vec_id", "embedding", k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromStore == recomputed && fromStore.nonEmpty,
      "stored-assignment IVF must equal the recompute form bit-for-bit")
    // a store holding cell ids the codebook lacks was built against a
    // DIFFERENT codebook — those rows could never be probed, so the
    // mismatch is refused loudly instead of silently dropping them
    val shrunk = cents.filter($"cell" < 8)
    val err = intercept[IllegalArgumentException] {
      Similarity.annJoinIvfAssigned(
        q, spark.read.parquet(store), shrunk,
        "vec_id", "embedding", k = 3, nprobe = 4)
    }
    assert(err.getMessage.contains("codebook"), err.getMessage)
  }

  test("codebook↔store version contract: same-range retrain refused at serve AND append; fp-less store refused") {
    // The r18 gap: an assignment built against a RETRAINED codebook
    // that kept its cell-id range was indistinguishable from data —
    // the cell-coverage check only caught a codebook that shrank.
    // Every row now carries the codebook fingerprint and every serve/
    // append requires a match.
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" % 20 === 0)
    val c = emb.filter($"vec_id" % 20 =!= 0)
    // id-ordered sample offset by `skip` rows: SAME cell-id range
    // 0..15, different vectors — the retrained-codebook shape
    def centTable(skip: Int) = {
      val rows = c.orderBy($"vec_id").limit(16 + skip)
        .select($"embedding").collect().drop(skip)
        .zipWithIndex.map { case (r, i) =>
          (i, r.getSeq[Float](0).map(_.toDouble)) }.toSeq
      rows.toDF("cell", "centroid")
    }
    val cents = centTable(0)
    val retrained = centTable(4)
    val store = java.nio.file.Files
      .createTempDirectory("ivf_fp_store").toString
    Similarity.ivfCellAssignments(c, cents, "vec_id", "embedding")
      .repartition($"cell")
      .write.mode("overwrite").partitionBy("cell", "codebook_fp")
      .parquet(store)
    val stored = spark.read.parquet(store)
    // the matching codebook serves (both guards are partition-
    // directory metadata in this layout — no store job)
    assert(Similarity.annJoinIvfAssigned(
      q, stored, cents, "vec_id", "embedding", k = 3, nprobe = 4)
      .count() > 0)
    // retrained same-range codebook at serve: REFUSED (pre-r19 this
    // silently served wrong neighbors)
    val e1 = intercept[IllegalArgumentException](
      Similarity.annJoinIvfAssigned(
        q, stored, retrained, "vec_id", "embedding", k = 3, nprobe = 4))
    assert(e1.getMessage.contains("DIFFERENT codebook"), e1.getMessage)
    // a store with no fingerprint column predates the contract: refused
    val e2 = intercept[IllegalArgumentException](
      Similarity.annJoinIvfAssigned(
        q, stored.drop("codebook_fp"), cents,
        "vec_id", "embedding", k = 3, nprobe = 4))
    assert(e2.getMessage.contains("codebook_fp"), e2.getMessage)
    // append-side, BEFORE the write (the store stays clean): a batch
    // declared against the retrained codebook cannot land on a store
    // built with the original
    val batch = Similarity.ivfCellAssignments(
      q, retrained, "vec_id", "embedding")
    val e3 = intercept[IllegalArgumentException](
      Similarity.appendCellAssignments(Seq(cents), batch, retrained, store))
    assert(e3.getMessage.contains("DIFFERENT codebook"), e3.getMessage)
    // and a MIS-DECLARED batch (rows assigned against one codebook,
    // append claiming another) lands in its own fingerprint directory
    // — the layout itself records the violation — and the post-write
    // check names it
    val fresh = java.nio.file.Files
      .createTempDirectory("ivf_fp_fresh").toString + "/store"
    val e4 = intercept[IllegalArgumentException](
      Similarity.appendCellAssignments(Nil, batch, cents, fresh))
    assert(e4.getMessage.contains("foreign"), e4.getMessage)
  }

  test("codebookDrift: equals categoricalDrift over the cell histograms; foreign batch refused") {
    // The retrain trigger: drift of an incoming batch's cell
    // occupancy against the store's baseline, version contract
    // enforced on BOTH frames — a batch assigned under a retrained
    // codebook cannot produce a silently absurd statistic.
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" % 20 === 0)
    val c = emb.filter($"vec_id" % 20 =!= 0)
    def centTable(skip: Int) = {
      val rows = c.orderBy($"vec_id").limit(16 + skip)
        .select($"embedding").collect().drop(skip)
        .zipWithIndex.map { case (r, i) =>
          (i, r.getSeq[Float](0).map(_.toDouble)) }.toSeq
      rows.toDF("cell", "centroid")
    }
    val cents = centTable(0)
    val store = java.nio.file.Files
      .createTempDirectory("ivf_drift_store").toString
    Similarity.ivfCellAssignments(c, cents, "vec_id", "embedding")
      .repartition($"cell")
      .write.mode("overwrite").partitionBy("cell", "codebook_fp")
      .parquet(store)
    val stored = spark.read.parquet(store)
    val batch = Similarity.ivfCellAssignments(q, cents, "vec_id", "embedding")
    val drift = Similarity.codebookDrift(batch, stored, cents)
      .collect().map(_.toSeq).toSet
    val direct = graft.operators.Checks.categoricalDrift(
        batch.select($"cell".cast("int").as("cell")),
        stored.select($"cell".cast("int").as("cell")), "cell")
      .collect().map(_.toSeq).toSet
    assert(drift == direct && drift.nonEmpty,
      "codebookDrift must be categoricalDrift over the cell histograms")
    // the monitored statistic is the contribution sum — finite on the
    // matched pair (every batch cell has baseline mass here)
    assert(drift.forall(_.length == 6))
    // a batch assigned under a retrained same-range codebook: refused
    val foreign = Similarity.ivfCellAssignments(
      q, centTable(4), "vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException](
      Similarity.codebookDrift(foreign, stored, cents))
    assert(e1.getMessage.contains("DIFFERENT codebook"), e1.getMessage)
    // and drift against a store whose codebook is not the serving
    // one is equally refused (the store-side half of the contract)
    val e2 = intercept[IllegalArgumentException](
      Similarity.codebookDrift(batch, stored, centTable(4)))
    assert(e2.getMessage.contains("DIFFERENT codebook"), e2.getMessage)
  }

  test("assigned-store consumers: label agreement and hard negatives equal their recompute forms; carry-less store refused") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" % 20 === 0)
    val c = emb.filter($"vec_id" % 20 =!= 0)
    // the sampled-centroid convention as a table (cell = sample rank),
    // so the stored forms must equal the literal-sampled recompute
    // forms bit-for-bit
    val cents = c.orderBy($"vec_id").limit(16)
      .select($"embedding").collect()
      .zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Float](0).map(_.toDouble)) }.toSeq
      .toDF("cell", "centroid")
    val store = java.nio.file.Files
      .createTempDirectory("ivf_carry_store").toString
    Similarity.ivfCellAssignments(
        c, cents, "vec_id", "embedding", carry = Seq("label"))
      .repartition($"cell")
      .write.mode("overwrite").partitionBy("cell", "codebook_fp")
      .parquet(store)
    val stored = spark.read.parquet(store)
    val agreeStored = Similarity.knnLabelAgreementIvfAssigned(
      q, stored, cents, "vec_id", "embedding", "label", k = 3, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val agreeRecompute = Similarity.knnLabelAgreementIvf(
      q, c, "vec_id", "embedding", "label", k = 3, nlist = 16, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(agreeStored == agreeRecompute && agreeStored.nonEmpty,
      "stored label agreement must equal the recompute diagnostic")
    val hnStored = Similarity.hardNegativesIvfAssigned(
      q, stored, cents, "vec_id", "embedding", "label", k = 3, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val hnRecompute = Similarity.hardNegativesIvf(
      q, c, "vec_id", "embedding", "label", k = 3, nlist = 16, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(hnStored == hnRecompute && hnStored.nonEmpty,
      "stored hard negatives must equal the recompute mining")
    // a store built WITHOUT the label passenger cannot back the label
    // consumers — refused with the fix spelled out, never a corpus join
    val bare = java.nio.file.Files
      .createTempDirectory("ivf_bare_store").toString
    Similarity.ivfCellAssignments(c, cents, "vec_id", "embedding")
      .repartition($"cell")
      .write.mode("overwrite").partitionBy("cell", "codebook_fp")
      .parquet(bare)
    val e = intercept[IllegalArgumentException](
      Similarity.knnLabelAgreementIvfAssigned(
        q, spark.read.parquet(bare), cents,
        "vec_id", "embedding", "label", k = 3, nprobe = 4))
    assert(e.getMessage.contains("carry"), e.getMessage)
  }

  test("ivfTopKKMeans: trained centroids, exact cosines from probed cells, decent recall") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val rest = emb.filter($"vec_id" =!= 0)
    val ivf = Similarity.ivfTopKKMeans(rest, "vec_id", "embedding", q, 10,
      nlist = 16, nprobe = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(ivf.nonEmpty)
    val all = Similarity.bruteForceTopK(rest, "vec_id", "embedding", q, Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach { case (id, c) => assert(math.abs(all(id) - c) < 1e-12) }
    val brute10 = Similarity.bruteForceTopK(rest, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    // cosine-trained cells should cluster directionally: recall at
    // least on par with the sample-centroid variant
    assert(ivf.map(_._1).toSet.intersect(brute10).size >= 2)
  }
}
