package graft.tools
import org.apache.spark.sql.SparkSession
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q59_label_purity", "q60_json_props", "q61_packing")) {
      println(s"===== $q")
      println(graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString.take(2500))
    }
    spark.stop()
  }
}
