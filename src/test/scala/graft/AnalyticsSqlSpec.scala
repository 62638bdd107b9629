package graft

/** Dual-surface proof (SURVEY.md §3.3): the analytics queries exist as
  * DataFrame programs AND as SQL text. For the queries whose oracle SQL is
  * dialect-shared ANSI (no DuckDB-only functions), Spark SQL must parse and
  * run the EXACT oracle string over temp views and produce row-identical
  * results to the DataFrame implementation — proving Catalyst handles the
  * SQL forms (CTEs, named windows, ranking functions) users would write. */
class AnalyticsSqlSpec extends SparkSpec {

  private def withViews[A](names: String*)(body: => A): A = {
    names.foreach(n => core.tbl(spark, sfDir, n).createOrReplaceTempView(n))
    try body finally names.foreach(spark.catalog.dropTempView(_))
  }

  private def assertSqlTwinMatches(qd: QueryDef, tables: String*): Unit =
    withViews(tables: _*) {
      val viaSql = spark.sql(qd.oracle.get).collect()
      val viaDf = qd.run(spark, sfDir).collect()
      assert(viaSql.length === viaDf.length)
      viaSql.zip(viaDf).zipWithIndex.foreach { case ((s, d), i) =>
        assert(s === d, s"${qd.name} row $i: sql=$s df=$d")
      }
    }

  test("q1 monthly revenue: Spark SQL runs the oracle text, row-identical to the DataFrame") {
    assertSqlTwinMatches(analytics.Analytics.q1MonthlyRevenue, "orders")
  }

  test("q2 customer segmentation: SQL twin matches (NTILE + partition aggregates)") {
    assertSqlTwinMatches(analytics.Analytics.q2CustomerSegmentation, "customer", "orders")
  }

  test("q3 product rank: SQL twin matches (RANK + pct-of-total)") {
    assertSqlTwinMatches(analytics.Analytics.q3ProductRank, "part", "lineitem")
  }

  test("SCD2 dimension build: SQL twin matches (lag/lead change-tracking windows)") {
    // events needs the ns→µs timestamp conversion the DataFrame path gets
    // from core.events — register THAT as the view, not the raw parquet
    core.events(spark, sfDir).createOrReplaceTempView("events")
    try {
      val qd = model.Warehouse.wScd2Dim
      val viaSql = spark.sql(qd.oracle.get).collect()
      val viaDf = qd.run(spark, sfDir).collect()
      assert(viaSql.length === viaDf.length)
      viaSql.zip(viaDf).foreach { case (s, d) => assert(s === d) }
    } finally spark.catalog.dropTempView("events")
  }
}
