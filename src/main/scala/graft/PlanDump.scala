package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: print `explain("formatted")` for named oracle
  * queries — the `.explain`-and-iterate loop (SCALE.md global
  * invariants: filters reach the scan, partial aggregation, unbroken
  * whole-stage codegen, broadcast where intended) as a one-command
  * check instead of ad-hoc console sessions.
  *
  * Usage: `runMain graft.PlanDump <sfDir> <queryName> [more names…]`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [query…]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, args(0)).explain("formatted")
        case None => println(
          s"unknown query '$n'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      }
    }
    spark.stop()
  }
}
