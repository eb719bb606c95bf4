package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph importance scoring — the web-graph quality signal a
  * crawl-derived training corpus weighs documents by (harvest rank /
  * PageRank family): a page linked from important pages is itself
  * important, computed as a fixed number of sparse matrix-vector
  * rounds over the edge list.
  *
  * Engine-portable by construction: ranks live in integer micro-units
  * (`unitRank` = 1.0) and every operation is long arithmetic —
  * `rank div out_degree` per edge, integer sums, `damping · s div
  * 1000` — so the result is bit-identical across engines,
  * partitionings, and summation orders (integer addition commutes;
  * double PageRank would not hash-match anything). The price is a
  * truncation of ≤ 1 micro-unit per division, well under any ranking
  * use's noise floor; the reward is a full-hash oracle over an
  * iterative graph algorithm.
  *
  * Semantics (pinned, and mirrored by the oracle): ranks start at
  * `unitRank`; each round every node sends `rank div deg` along each
  * out-edge and is reborn as
  * `((1000 − d)·unitRank) div 1000  +  (d · Σ incoming) div 1000`
  * with damping `d` in permille. DANGLING nodes (no out-edges) send
  * nothing — their damped mass leaves the system rather than being
  * redistributed, the simplest of the standard treatments; pass a
  * symmetrized edge list (or add self-loops) if that matters.
  *
  * Scale shape, same discipline as the connected-components loop
  * ([[Dedup]]): the distinct edge list is hash-partitioned by `src`
  * ONCE and persisted — the per-round edges⋈ranks join reuses that
  * layout every round, so only the (node, rank) table (one row per
  * node, two longs) moves per iteration. Each round is snapshotted
  * (localCheckpoint, or a reliable checkpoint dir for executor-churn
  * clusters) so plan lineage stays O(1) instead of growing by a
  * join+agg per round, and the superseded round's blocks release
  * after the next materializes. Rounds are a FIXED count — the usual
  * production choice for rank features (convergence detection costs a
  * driver action per round and changes no downstream decision).
  */
object Graph {

  def pageRankInt(
      edges: DataFrame, src: Column, dst: Column,
      iterations: Int = 3, dampingPermille: Long = 850L,
      unitRank: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille must be in [0, 1000], got $dampingPermille")
    require(unitRank >= 1, s"unitRank must be >= 1, got $unitRank")
    val spark = edges.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def snapshot(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true) else df.localCheckpoint(true)
    def release(df: DataFrame): Unit =
      if (checkpointDir.isEmpty)
        df.queryExecution.analyzed.collectFirst {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
        }.foreach(_.unpersist(false))

    // ONE persisted edge table, hash-partitioned by src, with the
    // out-degree riding on the edge row (a window over the exact
    // partitioning the repartition just built — no extra shuffle).
    // The per-round join is then edges⋈ranks only, reusing this
    // layout every round; just the (node, rank) table moves.
    val eDeg = edges
      .filter(src.isNotNull && dst.isNotNull)
      .select(src.as("src"), dst.as("dst"))
      .distinct()
      .repartition(col("src"))
      .withColumn("_deg",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("src"))))
      .persist()
    val nodes = eDeg.select(col("src").as("node"))
      .union(eDeg.select(col("dst").as("node")))
      .distinct()
      .persist()
    val baseRank = ((1000L - dampingPermille) * unitRank) / 1000L

    var ranks = snapshot(nodes.withColumn("rank", lit(unitRank)))
    var round = 0
    while (round < iterations) {
      val contribs = eDeg.as("e")
        .join(ranks.as("r"), col("e.src") === col("r.node"))
        .select(col("e.dst").as("node"),
          expr("rank div _deg").as("_c"))
        .groupBy(col("node"))
        .agg(sum(col("_c")).as("_s"))
      val next = snapshot(
        nodes.join(contribs, Seq("node"), "left")
          .select(col("node"),
            (lit(baseRank) +
              expr(s"($dampingPermille * coalesce(_s, CAST(0 AS BIGINT))) div 1000"))
              .as("rank")))
      release(ranks)
      ranks = next
      round += 1
    }
    eDeg.unpersist(false)
    nodes.unpersist(false)
    ranks
  }
}
