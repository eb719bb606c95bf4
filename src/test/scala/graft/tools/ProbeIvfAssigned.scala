package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Rehearsal probe (not part of the driver contract): the ANN
  * family's O(corpus) floor, measured the way the r17 increment probe
  * measured the dedup screen's — every IVF query used to re-assign
  * the WHOLE corpus against the codebook per run (nlist × dim flops
  * per corpus row); the materialized (id, vec, cell) assignment store
  * (Similarity.ivfCellAssignments) pays that once.
  *
  * Timed regions (min over 2 warm passes; run the probe twice and
  * take cross-run minima — house noise protocol):
  *   recompute   — annJoinIvfCentroids: per-run corpus-wide argmax
  *                 + probe join (the pre-r18 per-query cost)
  *   assigned    — annJoinIvfAssigned over the store: per-run cost is
  *                 the store SCAN + probe join only
  *   inc-assign  — ivfCellAssignments over a 1k-row increment (what a
  *                 daily append actually pays to grow the store)
  * The codebook and assignment store are UNTIMED fixtures — in
  * production they persist between runs, which is the point. Vary
  * SPARK_GRAFT_SF_DIR across target/scaledata/sf1 and sf10 to read
  * the corpus-scaling of each leg.
  */
object ProbeIvfAssigned {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scaledata/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Bench.evalAll

    def minWarm(label: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      evalAll(build) // cold
      val secs = Seq.fill(2) {
        val t0 = System.nanoTime(); evalAll(build); (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label: min ${secs.min}%.2f s (passes ${secs.map(s => f"$s%.2f").mkString(", ")})")
    }

    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") % 5000 === 0)
    val corpus = emb.filter(col("vec_id") % 5000 =!= 0)
    val increment = corpus.limit(1000)
    println(s"PROBE sizes: corpus=${corpus.count()} queries=${queries.count()} " +
      s"inc=${increment.count()}")

    // fixtures (untimed): the codebook (id-ordered sample, auto-sized
    // — the q209 convention) and the cell-partitioned assignment store
    val fixDir = s"target/fixtures/pid-${ProcessHandle.current().pid()}/probe_ivf"
    val nl = Similarity.autoNlist(corpus.count())
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    corpus.orderBy(col("vec_id")).limit(nl)
      .select(col("vec_id"), col("embedding"))
      .withColumn("cell", (row_number().over(w) - 1).cast("int"))
      .select(col("cell"), col("embedding").as("centroid"))
      .write.mode("overwrite").parquet(s"$fixDir/cents")
    val cents = spark.read.parquet(s"$fixDir/cents")
    // one file per cell (the posting-list layout): without the
    // repartition, partitionBy writes tasks × cells small files and
    // the read pays a listing tax that swamps the probe at rest
    Similarity.ivfCellAssignments(corpus, cents, "vec_id", "embedding")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell", "codebook_fp")
      .parquet(s"$fixDir/assigned")
    val store = spark.read.parquet(s"$fixDir/assigned")
    println(s"PROBE codebook: $nl cells; store rows ${store.count()}")

    minWarm("recompute (corpus-wide argmax per run)") {
      Similarity.annJoinIvfCentroids(
        queries, corpus, cents, "vec_id", "embedding", k = 10, nprobe = 4)
    }
    minWarm("assigned (store scan + probe join)") {
      Similarity.annJoinIvfAssigned(
        queries, store, cents, "vec_id", "embedding", k = 10, nprobe = 4)
    }
    minWarm("inc-assign (grow the store by 1k rows)") {
      Similarity.ivfCellAssignments(increment, cents, "vec_id", "embedding")
    }

    // the SERVING-layout question: the streamed sink maintains the
    // assignment as a LOG of batch subtrees (union read — no
    // partition pruning across subtrees), the compacted store is one
    // cell-partitioned table whose probe scan dynamic-partition-
    // prunes. A single query probing nprobe/nlist of the cells is
    // where the difference shows (a 100-query batch touches most
    // cells anyway).
    val logDir = s"$fixDir/assign_log"
    (0 until 8).foreach { b =>
      Similarity.ivfCellAssignments(
          corpus.filter(col("vec_id") % 8 === b), cents, "vec_id", "embedding")
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell", "codebook_fp")
        .parquet(s"$logDir/batch_$b")
    }
    val log = graft.streaming.StreamingCuration.readAssignmentLog(spark, logDir)
    val oneQuery = emb.filter(col("vec_id") === 0)
    minWarm("serve 1 query from 8-subtree LOG (union read)") {
      Similarity.annJoinIvfAssigned(
        oneQuery, log, cents, "vec_id", "embedding", k = 10, nprobe = 4)
    }
    minWarm("serve 1 query from COMPACTED store (DPP-pruned scan)") {
      Similarity.annJoinIvfAssigned(
        oneQuery, store, cents, "vec_id", "embedding", k = 10, nprobe = 4)
    }
    spark.stop()
  }
}
