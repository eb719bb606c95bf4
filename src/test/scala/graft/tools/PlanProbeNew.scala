package graft.tools
import graft.queries.{TemporalQueries, CheckQueries}
object PlanProbeNew {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val d = graft.TestSpark.sf
    for ((n, f) <- Seq(
        "q101" -> CheckQueries.q101KeySkew _,
        "q104" -> TemporalQueries.q104CoPairs _)) {
      val df = f(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"===== $n reused=${p.contains("ReusedExchange")} =====")
      println(p.linesIterator.filter(l => l.contains("Reused") || l.contains("Scan parquet") || l.contains("Join")).mkString("\n"))
    }
  }
}
