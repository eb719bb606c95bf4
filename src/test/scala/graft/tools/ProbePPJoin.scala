package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One-off measurement: candidate-join rows and distinct candidate
  * pairs for q11's prefix self-join, with and without the PPJoin
  * length+positional filters. Mirrors the pref construction in
  * Dedup.ngramJaccardPairsWithCaches (n=3, t=0.7, df cap 0.4).
  */
object ProbePPJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 3; val threshold = 0.7; val frac = 0.4
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val exAll = df.select(col("doc_id").as("id"),
        explode(graft.functions.NgramHashExpression
          .distinctNgramHashes(col("text"), n)).as("g"))
      .persist()
    val dfq = exAll.groupBy("g").agg(count(lit(1)).as("_df"))
    val total = df.agg(count(lit(1)).cast("double").as("_n"))
    val exf = exAll.join(dfq, "g").crossJoin(total)
      .filter(col("_df") <= col("_n") * frac).drop("_n").persist()
    val wRank = Window.partitionBy(col("id")).orderBy(col("_df").asc, col("g").asc)
    val pref = exf.select(col("id"), col("g"),
        row_number().over(wRank).as("_rn"),
        count(lit(1)).over(Window.partitionBy(col("id"))).as("_sz"))
      .filter(col("_rn") <=
        floor(lit(1.0 - threshold) * col("_sz") + lit(1e-6)) + 1)
      .persist()
    val base = pref.as("a").join(pref.as("b"),
      col("a.g") === col("b.g") && col("a.id") < col("b.id"))
    val ppLength =
      least(col("a._sz"), col("b._sz")).cast("double") >=
        lit(threshold) * greatest(col("a._sz"), col("b._sz")).cast("double") - lit(1e-6)
    val ppPositional =
      (lit(1L) + least(col("a._sz") - col("a._rn"), col("b._sz") - col("b._rn"))).cast("double") >=
        lit(threshold / (1.0 + threshold)) * (col("a._sz") + col("b._sz")).cast("double") - lit(1e-6)
    val filt = pref.as("a").join(pref.as("b"),
      col("a.g") === col("b.g") && col("a.id") < col("b.id") && ppLength && ppPositional)
    println(s"PPJOIN join_rows base=${base.count()} filtered=${filt.count()}")
    println(s"PPJOIN cand_pairs base=${base.select("a.id", "b.id").distinct().count()} " +
      s"filtered=${filt.select("a.id", "b.id").distinct().count()}")
    spark.stop()
  }
}
