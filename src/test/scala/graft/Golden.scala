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
    if (!Files.exists(p)) Map.empty else parse(Files.readString(p), path)
  }

  /** Parse golden JSON content; loud failure on a non-empty file that
    * yields zero entries (corrupt/reformatted, not "no goldens yet"). */
  def parse(content: String, where: String): Map[String, (Long, String)] = {
    // whitespace-tolerant so a hand-reformatted file still parses
    val entry = """"([^"]+)"\s*:\s*\{\s*"rows"\s*:\s*(\d+)\s*,\s*"fp"\s*:\s*"([0-9a-fA-F]{32})"\s*\}""".r
    val parsed = entry.findAllMatchIn(content)
      .map(m => m.group(1) -> (m.group(2).toLong, m.group(3).toLowerCase)).toMap
    require(parsed.nonEmpty || content.trim.isEmpty || content.trim == "{}",
      s"golden file $where is non-empty but no entries parsed — regenerate with " +
        "`sbt \"Test/runMain graft.GoldenGen\"`")
    parsed
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
