package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeated evaluation of one bench query in a single JVM — separates
  * first-execution cost (codegen + JIT) from steady-state data work.
  * Usage: runMain graft.tools.ProbeQ11 [queryName] (default q11).
  */
object ProbeQ11 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q11_ngram_jaccard")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count() // warm
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      graft.Bench.evalAll(graft.SparkEntry.queries(name)(spark, sfDir))
      println(f"PROBE $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(heap ${Runtime.getRuntime.maxMemory() / (1L << 30)}g)")
    }
    spark.stop()
  }
}
