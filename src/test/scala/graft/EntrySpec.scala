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

  test("every registered query evaluates on sf0.001 and matches its golden fingerprint") {
    val golden = Golden.load()
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // same per-query cache isolation as GoldenGen/Bench/Verify: persisted
      // intermediates must not accumulate across all 60+ queries in one JVM
      spark.catalog.clearCache()
      try {
        val df = fn(spark, sfDir)
        val (rows, fp) = Golden.fingerprint(df)
        // plan invariant over the WHOLE registry (plans are already built):
        // nothing may degenerate into an unbounded cross product
        val plan = df.queryExecution.executedPlan.toString
        val cartesian =
          if (plan.contains("CartesianProduct"))
            Some(s"$name: plan contains CartesianProduct") else None
        val drift = golden.get(name) match {
          case Some((gRows, gFp)) if gRows != rows || gFp != fp =>
            Some(s"$name: drifted (rows $gRows->$rows, fp $gFp->$fp)")
          case None if golden.nonEmpty =>
            Some(s"$name: no golden entry — run `sbt \"Test/runMain graft.GoldenGen\"`")
          case _ => None
        }
        cartesian ++ drift
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"${failures.size} queries failed:\n${failures.mkString("\n")}")
  }

  test("golden parser fails loudly on a corrupt non-empty file, quietly on an empty one") {
    assert(Golden.parse("", "t").isEmpty && Golden.parse("{}", "t").isEmpty)
    assert(Golden.parse("""{ "q" : { "rows" : 5 , "fp" : "0123456789abcdef0123456789abcdef" } }""",
      "t") === Map("q" -> (5L, "0123456789abcdef0123456789abcdef")))
    val err = intercept[IllegalArgumentException](Golden.parse("{ garbage", "t"))
    assert(err.getMessage.contains("no entries parsed"))
  }
}
