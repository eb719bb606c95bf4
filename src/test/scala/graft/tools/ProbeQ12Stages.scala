package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q12 portable MinHash-LSH pipeline:
  * signatures, band rows, raw band-collision enumeration, pigeonhole
  * floor survivors, full scored query. Each stage timed warm (second
  * of two runs) so codegen/JIT doesn't mask data work.
  */
object ProbeQ12Stages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val docs = graft.Tables.documents(spark, sfDir)

    def timed[A](label: String)(f: => A): A = {
      f // cold
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE12 $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    timed("signatures") {
      Dedup.minhashSignaturesPortable(docs, "doc_id", "text", 3, 64)
        .agg(count(lit(1))).head()
    }
    val sigs = Dedup.minhashSignaturesPortable(docs, "doc_id", "text", 3, 64)
      .persist()
    sigs.count()
    timed("band_rows") {
      Dedup.bandedDebug(sigs, 64, 16, portable = true)
        .agg(count(lit(1))).head()
    }
    timed("collision_rows") {
      val b = Dedup.bandedDebug(sigs, 64, 16, portable = true)
      val n = b.as("a").join(b.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
        .agg(count(lit(1))).head().getLong(0)
      println(s"PROBE12 collision_rows count = $n")
    }
    timed("floor_survivors") {
      val b = Dedup.bandedDebug(sigs, 64, 16, portable = true)
      val n = b.as("a").join(b.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id")).agg(count(lit(1)).as("_nb"))
        .filter(col("_nb") >= 4)
        .agg(count(lit(1))).head().getLong(0)
      println(s"PROBE12 floor_survivors count = $n")
    }
    timed("full_q12") {
      graft.Bench.evalAll(
        graft.SparkEntry.queries("q12_minhash_lsh")(spark, sfDir))
    }
    sigs.unpersist()
    spark.stop()
  }
}
