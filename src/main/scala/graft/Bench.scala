package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

object Bench {
  /** Force FULL evaluation of every output column: hash each row
    * across all columns and XOR-fold the hashes. A bare `count()` lets
    * Catalyst prune unreferenced projections, so projection-only
    * queries (per-row expression work) would be timed as little more
    * than a scan count. XOR (not SUM) because summing uniform 64-bit
    * hashes overflows Long almost immediately under Spark 4's default
    * ANSI mode (ARITHMETIC_OVERFLOW aborts the job); bit_xor is closed
    * under 64 bits and still forces every column of every row.
    */
  def evalAll(df: DataFrame): Unit = {
    df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("_h"))
      .agg(bit_xor(col("_h"))).head()
    ()
  }

  final case class QueryResult(name: String, sec: Double, err: Option[String])

  /** Run each query to full evaluation, timing it and capturing any
    * failure as data. Failures are NOT swallowed into a fake success:
    * the error message is carried per-query so the caller can report
    * and exit nonzero.
    */
  def run(
      queries: Seq[(String, (SparkSession, String) => DataFrame)],
      spark: SparkSession,
      sfDir: String): Seq[QueryResult] =
    queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { evalAll(fn(spark, sfDir)); None }
        catch {
          case e: Throwable =>
            Some(Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("\\s+", " ").take(300))
        }
      QueryResult(name, (System.nanoTime() - t0) / 1e9, err)
    }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JVM/codegen/parquet-footer paths so the first timed
    // query doesn't absorb session init; not part of any measurement
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // one-time setup outside any timed region (e.g. q37's partitioned
    // layout) so timed queries measure reads, not sibling writes
    SparkEntry.benchSetup(spark, sfDir)
    val results = run(SparkEntry.queries.toSeq.sortBy(_._1), spark, sfDir)
    val qs = results.map(r => jsonStr(r.name) + ":" + r.sec)
      .mkString("{", ",", "}")
    val errs = results.collect { case QueryResult(n, _, Some(e)) =>
      jsonStr(n) + ":" + jsonStr(e)
    }
    val errJson = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = results.map(_.sec).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errs.nonEmpty) {
      System.err.println(s"BENCH FAILED: ${errs.size} of ${results.size} queries errored")
      sys.exit(1)
    }
  }
}
