package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Golden-result fingerprints: a checked-in (rows, md5) per query at
  * sf0.001, giving every refactor instant result-drift detection from
  * `sbt test` — no DuckDB replay needed. The fingerprint is order- and
  * partitioning-insensitive: columns sorted by name, rows rendered to JSON,
  * renderings sorted, digest over the concatenation.
  *
  * Regenerate after an INTENTIONAL result change with
  * `sbt "Test/runMain graft.GoldenGen"` and commit the diff — the diff
  * itself then documents which queries changed results.
  */
object Golden {
  val path = "src/test/resources/golden_sf0.001.json"

  def fingerprint(df: DataFrame): (Long, String) = {
    val canon = df.select(df.columns.sorted.map(col): _*)
    val rendered = canon.toJSON.collect().sorted
    val md = MessageDigest.getInstance("MD5")
    rendered.foreach(r => md.update(r.getBytes("UTF-8")))
    (rendered.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  def load(): Map[String, (Long, String)] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Map.empty
    else {
      val entry = """"([^"]+)":\{"rows":(\d+),"fp":"([0-9a-f]{32})"\}""".r
      entry.findAllMatchIn(Files.readString(p))
        .map(m => m.group(1) -> (m.group(2).toLong, m.group(3))).toMap
    }
  }
}

/** Regenerates the golden file over every registered query. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    val entries = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.catalog.clearCache()
      val (rows, fp) = Golden.fingerprint(fn(spark, SparkSpec.sfDir))
      println(s"[golden] $name rows=$rows fp=$fp")
      s""""$name":{"rows":$rows,"fp":"$fp"}"""
    }
    Files.writeString(Paths.get(Golden.path), entries.mkString("{\n", ",\n", "\n}\n"))
    println(s"[golden] wrote ${entries.size} entries to ${Golden.path}")
    spark.stop()
  }
}
