package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup
import graft.streaming.StreamingCuration

/** Rehearsal probe (not part of the driver contract): the streamed
  * incremental screen's per-trigger cost measured THROUGH the sink
  * itself (r17 verdict item: the ninth maintained surface's O(batch)
  * claim was argued from the operator probe, not measured at the
  * sink). Eight ~1k-doc micro-batches are driven through
  * incrementalScreenSink against a seeded corpus store at the target
  * scale, banded twin off then on, and each trigger is timed wall to
  * wall (screen + kept write + store append — everything a trigger
  * pays). The claim under test: per-trigger cost is flat across the
  * eight batches (the store grows by ~1k rows per trigger — invisible
  * next to the corpus artifact scan) and the banded twin removes the
  * per-trigger corpus re-banding exactly as it did for the batch
  * operator.
  *
  * House noise protocol: run twice, read cross-run minima per batch
  * position; the per-position spread across the 8 batches within one
  * run is itself the flatness signal.
  */
object ProbeStreamedScreen {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scaledata/sf1")
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = Tables.documents(spark, sfDir)
    // corpus = ids not ≡ 0 (mod 750); 8 batches of ~corpus/750/8 docs
    val corpus = docs.filter(col("doc_id") % 750 =!= 0)
    val newDocs = docs.filter(col("doc_id") % 750 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val batches = newDocs.grouped(math.max(1, newDocs.length / 8)).take(8).toSeq
    println(s"PROBE sizes: corpus=${corpus.count()} batches=${batches.map(_.length).mkString(",")}")

    val fixDir = s"target/fixtures/pid-${ProcessHandle.current().pid()}/probe_stream_screen"
    def run(label: String, banded: Boolean): Unit = {
      val store = s"$fixDir/${label}_store"; val kept = s"$fixDir/${label}_kept"
      val bandStore = s"$fixDir/${label}_bands"; val ckpt = s"$fixDir/${label}_ckpt"
      Dedup.minhashSignaturesPortable(corpus, "doc_id", "text",
          n = 4, numHashes = 64, words = true)
        .write.mode("overwrite").parquet(s"$store/base")
      if (banded)
        Dedup.bandedSignatures(spark.read.parquet(s"$store/base"), 64, 16,
            portable = true)
          .write.mode("overwrite").parquet(s"$bandStore/base")
      val stream = MemoryStream[(Long, String)]
      val sq = StreamingCuration.incrementalScreenSink(
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
        store, kept, ckpt, n = 4, numHashes = 64, bands = 16,
        threshold = 0.8, words = true,
        bandedPath = if (banded) Some(bandStore) else None)
      val times = batches.map { b =>
        stream.addData(b.toSeq)
        val t0 = System.nanoTime(); sq.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      sq.stop()
      println(f"PROBE $label per-trigger: ${times.map(t => f"$t%.2f").mkString(", ")} " +
        f"(min ${times.min}%.2f, max ${times.max}%.2f)")
    }
    run("plain", banded = false)
    run("banded", banded = true)
    spark.stop()
  }
}
