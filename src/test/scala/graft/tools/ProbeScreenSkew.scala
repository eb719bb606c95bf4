package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Rehearsal probe (not part of the driver contract): WHERE the
  * broadcast screen's pair-count crossover actually sits on a
  * hot-template corpus — the r17 verdict's dormant-path question
  * (the salted shuffle path's hot-bucket census never engages on the
  * bench corpora; this measures the skew shape it exists for, the
  * same way the 2²⁰-edge closure crossover was measured rather than
  * asserted).
  *
  * Corpus: `mult` copies of ONE template (the boilerplate shape
  * near-dedup exists for) + 50k distinct filler docs. Increment: 20
  * docs matching the template + 80 novel. Candidate pairs ≈ 20 ×
  * mult, so mult sweeps the pair count across the 4M gate
  * (Limits.BroadcastRowLimit). Each route is FORCED via
  * pairBroadcastLimit (MaxValue = always broadcast, 0 = always salt)
  * to time both sides of the crossover at every point; the default
  * gate picks broadcast below 4M pairs and the salted path above.
  */
object ProbeScreenSkew {
  def main(args: Array[String]): Unit = {
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

    val template = "the hot boilerplate template that repeats across this " +
      "entire corpus verbatim in every copy without any variation at all"
    val fixDir = s"target/fixtures/pid-${ProcessHandle.current().pid()}/probe_skew"
    val inc = spark.range(100).select(col("id").as("doc_id"),
      when(col("id") < 20, lit(template))
        .otherwise(concat(lit("novel increment doc "), col("id"),
          lit(" with its own unrepeated wording"))).as("text"))

    for (mult <- Seq(50000L, 200000L, 1000000L)) {
      val corpus = spark.range(mult)
        .select((col("id") + 1000000L).as("doc_id"), lit(template).as("text"))
        .union(spark.range(50000)
          .select((col("id") + 5000000L).as("doc_id"),
            concat(lit("distinct corpus filler "), col("id"),
              lit(" wording varies by row")).as("text")))
      val sigDir = s"$fixDir/sigs_$mult"
      Dedup.minhashSignaturesPortable(corpus, "doc_id", "text",
          n = 4, numHashes = 64, words = true)
        .write.mode("overwrite").parquet(sigDir)
      val sigs = spark.read.parquet(sigDir)
      val bandDir = s"$fixDir/bands_$mult"
      Dedup.bandedSignatures(sigs, 64, 16, portable = true)
        .write.mode("overwrite").parquet(bandDir)
      val banded = spark.read.parquet(bandDir)
      println(s"PROBE mult=$mult: pairs ~ ${20L * mult} " +
        s"(gate ${graft.Limits.BroadcastRowLimit})")
      def screen(limit: Long) = {
        val (kept, s) = Dedup.dropNearDuplicatesAgainstBanded(
          sigs, banded, inc, "doc_id", "text",
          n = 4, numHashes = 64, bands = 16, threshold = 0.8,
          portable = true, words = true, pairBroadcastLimit = limit)
        graft.CacheLifecycle.releaseAfterFirstUse(Seq(s))
        kept
      }
      minWarm(s"mult=$mult broadcast-forced")(screen(Long.MaxValue))
      minWarm(s"mult=$mult salted-forced")(screen(0L))
    }
    spark.stop()
  }
}
