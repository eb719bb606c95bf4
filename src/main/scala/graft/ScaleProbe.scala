package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Operator-level scaling probe for the SCALE REHEARSAL: times the
  * IVF ANN join on a corpus at a GIVEN (nlist, nprobe) config so the
  * fixed-config vs auto-√n scaling exponents can be measured on the
  * same corpora the query-level rehearsal uses (SCALE.md). Separate
  * from Bench because the oracle-pinned q58-family queries state
  * their config as literals — the probe varies what they pin.
  *
  * Usage: `runMain graft.ScaleProbe <sfDir> <nlist (0 = auto)> <nprobe> [mode]`
  * mode `literal` (default) times `annJoinIvfSampled`; `table` times
  * `annJoinIvfCentroids` over the same id-ordered centroid sample
  * materialized as a table. Prints one JSON line: cold + min-warm
  * seconds and the resolved row counts.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleProbe <sfDir> <nlist> <nprobe>")
    val (d, nlist, nprobe) = (args(0), args(1).toInt, args(2).toInt)
    val mode = if (args.length > 3) args(3) else "literal"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, d)
    val queries = emb.filter(col("vec_id") % 20 === 0)
    val corpus = emb.filter(col("vec_id") % 20 =!= 0)
    val (nq, nc) = (queries.count(), corpus.count())
    val S = graft.operators.Similarity
    lazy val centTable = {
      import spark.implicits._
      val nl = if (nlist == 0) S.autoNlist(nc) else nlist
      corpus.orderBy(col("vec_id")).limit(nl)
        .select(col("embedding")).collect()
        .zipWithIndex.map { case (r, i) => (i, S.rowVecToDoubles(r)) }
        .toSeq.toDF("cell", "centroid")
    }
    def once(): Double = {
      val t0 = System.nanoTime()
      Bench.evalAll(mode match {
        case "table" => S.annJoinIvfCentroids(
          queries, corpus, centTable, "vec_id", "embedding", k = 3,
          nprobe = nprobe)
        case _ => S.annJoinIvfSampled(
          queries, corpus, "vec_id", "embedding", k = 3,
          nlist = nlist, nprobe = nprobe)
      })
      (System.nanoTime() - t0) / 1e9
    }
    val cold = once()
    val warm = Seq.fill(2)(once()).min
    println(s"""{"metric":"ivf_probe","sf":"$d","mode":"$mode","nlist":$nlist,"nprobe":$nprobe,""" +
      s""""n_queries":$nq,"n_corpus":$nc,"cold":$cold,"warm":$warm}""")
    spark.stop()
  }
}
