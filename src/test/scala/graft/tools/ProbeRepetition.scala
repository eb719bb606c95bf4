package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Ad-hoc timing probe for q38's components (not driver contract). */
object ProbeRepetition {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def evalAll(df: org.apache.spark.sql.DataFrame): Unit = graft.Bench.evalAll(df)

    val t = col("text")
    val lines = split(t, "\n")
    val toks = regexp_extract_all(t, lit("\\S+"), lit(0))
    timed("lines-only")(evalAll(docs.select(col("doc_id"), size(lines).as("n_lines"))))
    timed("toks-only")(evalAll(docs.select(col("doc_id"), size(toks).as("n_toks"))))
    timed("dup-line")(evalAll(docs.select(col("doc_id"),
      (lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines).cast("double")).as("dlf"))))
    val bigrams = graft.operators.TextAnalysis.wordShinglesWithDups(t, 2)
    timed("bigrams")(evalAll(docs.select(col("doc_id"),
      when(size(bigrams) > 0,
        lit(1.0) - size(array_distinct(bigrams)).cast("double") / size(bigrams).cast("double"))
        .otherwise(lit(0.0)).as("dbf"))))
    val top = docs.select(col("doc_id").as("_tid"),
        explode(regexp_extract_all(t, lit("\\S+"), lit(0))).as("_w"))
      .select(col("_tid"), xxhash64(col("_w")).as("_wh"))
      .groupBy("_tid", "_wh").agg(count(lit(1)).as("_c"))
      .groupBy("_tid").agg(max(col("_c")).as("_top"))
    timed("top-word")(evalAll(top))
    timed("q38-full")(evalAll(
      graft.operators.TextAnalysis.repetitionSignals(docs, "doc_id", "text")))
    spark.stop()
  }
}
