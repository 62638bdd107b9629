package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan auditor: prints the formatted physical plan of registered queries —
  * the tool used to confirm scan pushdown (`PushedFilters`, pruned
  * `ReadSchema`), broadcast joins on dimension sides, and WholeStageCodegen
  * coverage before a query is considered done.
  *
  * Usage: `sbt "runMain graft.Explain [nameRegex] [sfDir]"` (defaults: all
  * queries, sf0.01).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val pattern = args.headOption.getOrElse(".*").r
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => pattern.findFirstIn(n).isDefined }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try println(fn(spark, sfDir).queryExecution.explainString(FormattedMode))
        catch { case e: Throwable => println(s"[explain failed: ${e.getMessage}]") }
      }
    spark.stop()
  }
}
