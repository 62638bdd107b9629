package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: probe how Spark 4.1 reads the driver-generated parquet
  * (timestamp precisions, schema inference) before building on it. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("lineitem", "orders", "events", "documents", "embeddings")) {
      println(s"=== $t")
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        df.printSchema()
        df.show(3, truncate = 60)
      } catch { case e: Throwable => println(s"READ FAILED: ${e.getMessage.take(500)}") }
    }
    spark.stop()
  }
}
