package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Rehearsal probe (not part of the driver contract): the
  * O(increment)-not-O(corpus) claim of the incremental screen
  * measured DIRECTLY, by varying increment size and corpus size
  * independently within one corpus (word unit — the production
  * spelling):
  *
  *   inc-scaling  — screen a 0.2% then a 2% increment against the
  *                  SAME full corpus signature table: cost should
  *                  scale ~with the increment (×10 work ⇒ ≲×10 time,
  *                  floored by the fixed corpus-side band-table scan)
  *   corpus-scaling — screen the SAME 0.2% increment against a 1/10
  *                  corpus sig table then the full one: cost should
  *                  grow far slower than ×10 (the probe side is
  *                  fixed; only the corpus band table rescans)
  *
  * Corpus signatures are UNTIMED parquet fixtures (the materialized
  * between-runs artifact). Timed regions are min over 2 warm passes;
  * run the probe twice and take cross-run minima (house protocol).
  */
object ProbeIncrementScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val docs = Tables.documents(spark, sfDir)
    // corpus = ids not ≡ 0 (mod 500); increments drawn from the ≡ 0 residue
    val corpusFull = docs.filter(col("doc_id") % 500 =!= 0)
    val corpusTenth = corpusFull.filter(col("doc_id") % 10 === 1)
    val incSmall = docs.filter(col("doc_id") % 500 === 0)                  // 0.2%
    val incLarge = docs.filter(col("doc_id") % 50 === 0)                   // 2%
    println(s"PROBE sizes: corpusFull=${corpusFull.count()} corpusTenth=${corpusTenth.count()} " +
      s"incSmall=${incSmall.count()} incLarge=${incLarge.count()}")

    val fixDir = s"target/fixtures/pid-${ProcessHandle.current().pid()}/probe_incscale"
    Dedup.minhashSignaturesPortable(corpusFull, "doc_id", "text", n = 4, numHashes = 64, words = true)
      .write.mode("overwrite").parquet(s"$fixDir/full")
    Dedup.minhashSignaturesPortable(corpusTenth, "doc_id", "text", n = 4, numHashes = 64, words = true)
      .write.mode("overwrite").parquet(s"$fixDir/tenth")
    val sigsFull = spark.read.parquet(s"$fixDir/full")
    val sigsTenth = spark.read.parquet(s"$fixDir/tenth")

    def screen(sigs: org.apache.spark.sql.DataFrame, inc: org.apache.spark.sql.DataFrame) =
      Dedup.dropNearDuplicatesAgainst(sigs, inc, "doc_id", "text",
        n = 4, numHashes = 64, bands = 16, threshold = 0.8,
        portable = true, words = true)

    minWarm("inc 0.2% vs corpus 100%")(screen(sigsFull, incSmall))
    minWarm("inc   2% vs corpus 100%")(screen(sigsFull, incLarge))
    minWarm("inc 0.2% vs corpus  10%")(screen(sigsTenth, incSmall))

    // the PRE-BANDED spelling: corpus band table read from its
    // materialized store instead of recomputed per run
    Dedup.bandedSignatures(sigsFull, numHashes = 64, bands = 16, portable = true)
      .write.mode("overwrite").parquet(s"$fixDir/full_banded")
    val bandedFull = spark.read.parquet(s"$fixDir/full_banded")
    def screenPre(inc: org.apache.spark.sql.DataFrame) = {
      val (kept, sigs) = Dedup.dropNearDuplicatesAgainstBanded(
        sigsFull, bandedFull, inc, "doc_id", "text",
        n = 4, numHashes = 64, bands = 16, threshold = 0.8,
        portable = true, words = true)
      graft.CacheLifecycle.releaseAfterFirstUse(Seq(sigs))
      kept
    }
    minWarm("inc 0.2% vs corpus 100% PREBANDED")(screenPre(incSmall))
    minWarm("inc   2% vs corpus 100% PREBANDED")(screenPre(incLarge))
    spark.stop()
  }
}
