package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.log4j.{AppenderSkeleton, Level, Logger}
import org.apache.log4j.spi.LoggingEvent
import scala.collection.mutable.ArrayBuffer

/** Runs every SparkEntry query under CODEGEN_ONLY factory mode and records
  * any WholeStageCodegen fallback / Janino compile error per query. A
  * fallback means the expression runs interpreted — a silent perf hazard
  * on the 100 TB path. Diagnostic tool only, not shipped in the library.
  */
object CodegenAudit {
  private final class Capture extends AppenderSkeleton {
    val hits = new ArrayBuffer[String]()
    override def append(e: LoggingEvent): Unit = {
      val m = String.valueOf(e.getMessage)
      if (m.contains("Codegen disabled") || m.contains("Failed to compile") ||
          m.contains("fallback") || m.contains("grows beyond") ||
          m.contains("Cannot compile"))
        hits.synchronized { hits += m.take(400) }
    }
    override def close(): Unit = ()
    override def requiresLayout(): Boolean = false
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("codegen-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.logging.maxLines", "0")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cap = new Capture
    Seq("org.apache.spark.sql.execution.WholeStageCodegenExec",
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
        "org.apache.spark.sql.execution.WholeStageCodegen").foreach { n =>
      val lg = Logger.getLogger(n); lg.setLevel(Level.WARN); lg.addAppender(cap)
    }
    Logger.getRootLogger.addAppender(cap)

    val results = ArrayBuffer[(String, Int)]()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val before = cap.hits.size
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable =>
          println(s"ERR $name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(160)}")
      }
      val n = cap.hits.size - before
      if (n > 0) {
        results += ((name, n))
        println(s"FALLBACK $name: $n hits")
        cap.hits.drop(before).take(2).foreach(h => println(s"    $h"))
      }
    }
    println(s"AUDIT DONE: ${results.size} queries with codegen fallbacks out of ${graft.SparkEntry.queries.size}")
    spark.stop()
  }
}
