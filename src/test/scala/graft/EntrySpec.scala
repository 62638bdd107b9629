package graft

/** Smoke net over the whole registry: every registered QueryDef must run
  * end-to-end on the sf0.001 tables without throwing (this is what catches
  * ANSI-mode crashes — overflow, bad array index — that only surface at
  * evaluation time), and the driver-contract surfaces must stay coherent. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql stay aligned: every oracle key is a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert(q.size === SparkEntry.defs.size) // no name collisions collapsed the map
  }

  test("every registered query evaluates on sf0.001 without error") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"${failures.size} queries failed:\n${failures.mkString("\n")}")
  }
}
