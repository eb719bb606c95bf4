package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for q14b (hyperplane-LSH embedding near-dup). */
object ProbeQ14b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val emb = graft.Tables.embeddings(spark, sfDir)

    def timed[A](label: String)(f: => A): A = {
      f // cold
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE14B $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    timed("scan_norm") {
      emb.select(col("vec_id"), graft.functions.DqFunctions.l2Norm(col("embedding")))
        .agg(count(lit(1))).head()
    }
    timed("buckets") {
      val v = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      v.select(col("id"),
          explode(array((0 until 4).map { t =>
            struct(lit(t).as("tbl"),
              Dedup.signBucket(col("v"), 64, 12, seedOffset = t * 12).as("bkt"))
          }: _*)).as("tb"))
        .agg(count(lit(1))).head()
    }
    timed("collision_count") {
      val v = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      val b = v.select(col("id"),
          explode(array((0 until 4).map { t =>
            struct(lit(t).as("tbl"),
              Dedup.signBucket(col("v"), 64, 12, seedOffset = t * 12).as("bkt"))
          }: _*)).as("tb"))
        .select(col("id"), col("tb.tbl"), col("tb.bkt"))
      val n = b.as("a").join(b.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
            col("a.id") < col("b.id"))
        .agg(count(lit(1))).head().getLong(0)
      println(s"PROBE14B collision rows = $n")
    }
    timed("full_q14b") {
      graft.Bench.evalAll(
        graft.SparkEntry.queries("q14b_embedding_lsh")(spark, sfDir))
    }
    spark.stop()
  }
}
