package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for q55 (column profile): isolates the distinct-count
  * expand from the plain decimal-sum aggregate.
  */
object ProbeQ55 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.Tables.lineitem(spark, sfDir)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

    def timed[A](label: String)(f: => A): A = {
      f
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE55 $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    timed("sums_only") {
      val aggs = cols.flatMap { c =>
        val d = col(c).cast("decimal(18,2)")
        Seq(count(col(c)), min(col(c)), max(col(c)), sum(d), sum(d * d))
      }
      li.agg(aggs.head, aggs.tail: _*).head()
    }
    timed("distinct_only") {
      val aggs = cols.map(c => count_distinct(col(c)))
      li.agg(aggs.head, aggs.tail: _*).head()
    }
    timed("one_distinct") {
      li.agg(count_distinct(col("l_extendedprice"))).head()
    }
    timed("full_q55") {
      graft.Bench.evalAll(
        graft.SparkEntry.queries("q55_column_profile")(spark, sfDir))
    }
    spark.stop()
  }
}
