package graft.tools
import org.apache.spark.sql.SparkSession
// Plan-shape probe for the round-5 additions (q77-q80): dump executed
// plans to eyeball partial aggregation, pushed filters, broadcast sides.
object ProbeNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q77_merkle_recon", "q78_arrival_gaps", "q79_histogram", "q80_scd2")) {
      println(s"===== $q")
      println(graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
