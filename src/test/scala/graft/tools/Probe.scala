package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Ad-hoc plan/volume probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val (_, sigs) = Dedup.lshCandidatePairsWithSignatures(
      docs, "doc_id", "text", n = 3, numHashes = 64, bands = 16, portable = true)
    timed("signatures")(sigs.count())
    val banded16 = Dedup.lshCandidatePairsFromSignatures(sigs, 64, 16, portableBuckets = true)
    // candidate pairs BEFORE the threshold filter
    timed("pairs16-count") {
      val n = banded16.count()
      println(s"PROBE candidates at bands=16: $n")
    }
    timed("pairs16-ge08") {
      val n = banded16.filter(col("est_jaccard") >= 0.8).count()
      println(s"PROBE surviving >=0.8 at bands=16: $n")
    }
    val banded8 = Dedup.lshCandidatePairsFromSignatures(sigs, 64, 8, portableBuckets = true)
    timed("pairs8-count") {
      val n = banded8.count()
      println(s"PROBE candidates at bands=8: $n")
    }
    sigs.unpersist()
    timed("nearDup16-prefiltered") {
      val n = Dedup.lshNearDupPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.8, portable = true).count()
      println(s"PROBE lshNearDupPairs >=0.8: $n")
    }
    // bucket-size skew: raw collision rows the self-join must emit
    val (_, sigs2) = Dedup.lshCandidatePairsWithSignatures(
      docs, "doc_id", "text", n = 3, numHashes = 64, bands = 16, portable = true)
    val bstats = graft.operators.Dedup.bandedDebug(sigs2, 64, 16, portable = true)
      .groupBy("band", "bucket").agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("max_bucket"),
        sum(col("c") * (col("c") - 1) / 2).as("raw_collision_rows"),
        count(lit(1)).as("n_buckets"))
      .head()
    println(s"PROBE bucket stats: $bstats")
    sigs2.unpersist()
    spark.stop()
  }
}
