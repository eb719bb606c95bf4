package graft.tools
object PlanProbeNew {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val d = graft.TestSpark.sf
    val df = graft.queries.EvalQueries.q119Auc(spark, d)
    val p = df.queryExecution.executedPlan.toString
    println(p.linesIterator
      .filter(l => l.contains("Scan") || l.contains("InMemory"))
      .map(_.trim.take(150)).mkString("\n"))
  }
}
