package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Checks, Similarity}

/** Rehearsal probe (not part of the driver contract): what the q224
  * retrain-trigger costs, and what the assignment store is worth to
  * MONITORING (not just serving).
  *
  * Two forms of the same statistic (chi-square cell-occupancy drift
  * of a fixed incoming batch vs the corpus baseline, both under the
  * serving codebook):
  *
  *   drift-stored    — Similarity.codebookDrift against the
  *                     (cell, codebook_fp)-partitioned store: the
  *                     baseline histogram groups a partition column
  *                     (directory names + footer row counts — the
  *                     scan carries an empty data schema), so the
  *                     cost should stay FLAT as the corpus grows.
  *   drift-recompute — the storeless spelling: re-assign the corpus
  *                     (argmax per row) and histogram the result per
  *                     run. Pays the exact O(corpus) floor the store
  *                     exists to remove — should grow with the
  *                     corpus.
  *
  * The batch's own assignment is an untimed fixture: in production
  * the monitor reads the SAME ivfCellAssignments output the append
  * path writes (the argmax is paid once for drift and append), so
  * the drift-only marginal cost is what to measure. Timed regions
  * are min over 2 warm passes; run the probe twice and take
  * cross-run minima — house noise protocol. Vary SPARK_GRAFT_SF_DIR
  * across target/scaledata/sf1 and sf10 to read the corpus scaling.
  */
object ProbeCodebookDrift {
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
    val nl = Similarity.autoNlist(corpus.count())
    println(s"PROBE sizes: corpus=${corpus.count()} batch=${queries.count()} nlist=$nl")

    // fixtures (untimed): the q209-convention codebook, the written
    // store, and the batch's assignment (shared with the append path)
    val fixDir = s"target/fixtures/pid-${ProcessHandle.current().pid()}/probe_cb_drift"
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    corpus.orderBy(col("vec_id")).limit(nl)
      .select(col("vec_id"), col("embedding"))
      .withColumn("cell", (row_number().over(w) - 1).cast("int"))
      .select(col("cell"), col("embedding").as("centroid"))
      .write.mode("overwrite").parquet(s"$fixDir/cents")
    val cents = spark.read.parquet(s"$fixDir/cents")
    Similarity.ivfCellAssignments(corpus, cents, "vec_id", "embedding")
      .repartition(col("cell"))
      .write.mode("overwrite")
      .partitionBy("cell", "codebook_fp").parquet(s"$fixDir/assigned")
    val store = spark.read.parquet(s"$fixDir/assigned")
    val batch = Similarity
      .ivfCellAssignments(queries, cents, "vec_id", "embedding")
      .persist()
    batch.count()

    minWarm("drift-stored")(
      Similarity.codebookDrift(batch, store, cents))

    minWarm("drift-recompute")(
      Checks.categoricalDrift(
        batch.select(col("cell").cast("int").as("cell")),
        Similarity.ivfCellAssignments(corpus, cents, "vec_id", "embedding")
          .select(col("cell").cast("int").as("cell")),
        "cell"))

    batch.unpersist(blocking = false)
    spark.stop()
  }
}
