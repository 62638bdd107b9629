package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan invariants — the at-scale design claims (README "Designed
  * for 100 TB") asserted as tests, not prose: predicate pushdown reaches the
  * parquet scan, dimension joins broadcast, and bucketed tables join without
  * re-shuffling either side. */
class PlanSpec extends SparkSpec {

  /** Execute (so AQE finalizes) and render the physical plan. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("incremental scan pushes its watermark predicate into the parquet scan") {
    val df = operators.Relational.s2IncrementalScan.run(spark, sfDir)
    val plan = finalPlan(df)
    assert(plan.contains("PushedFilters:"), "no pushdown section in scan")
    assert(plan.contains("GreaterThan(o_orderdate"),
      s"watermark predicate not pushed:\n${plan.take(800)}")
  }

  test("jdbc extraction pushes the incremental predicate into the database scan") {
    val df = sources.Ingest.sJdbcSource.run(spark, sfDir)
    val plan = finalPlan(df)
    assert(plan.contains("JDBCRelation"), "not reading through the JDBC scan")
    assert(plan.contains("numPartitions=8"), "extraction not split into parallel key ranges")
    assert(plan.contains("PushedFilters:") &&
      plan.toLowerCase.contains("greaterthanorequal(o_orderdate"),
      s"watermark predicate not pushed into the database:\n${plan.take(800)}")
  }

  test("customers-mirror extraction pushes the id watermark into the second database") {
    val df = sources.Ingest.jdbcCustomersPast(spark, sfDir, 100L)
    val plan = finalPlan(df)
    assert(plan.contains("JDBCRelation"), "not reading through the JDBC scan")
    assert(plan.contains("numPartitions=8"), "extraction not split into parallel key ranges")
    assert(plan.contains("GreaterThan(customer_id,100)"),
      s"id watermark not pushed into the database:\n${plan.take(800)}")
  }

  test("boilerplate removal joins the boiler set as broadcast, never sort-merge") {
    val plan = finalPlan(llm.TextOps.tBoilerplateCorpus.run(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "line stream degenerated to a sort-merge shuffle join against the boiler set")
  }

  test("mixture sampling broadcasts the per-domain rate table") {
    val plan = finalPlan(llm.TextOps.tMixtureSample.run(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "docs⋈rates degenerated to a sort-merge shuffle join")
  }

  test("ADC re-rank fetches beam vectors via broadcast — the corpus never shuffles") {
    // stage 2's whole scale story: 50 beam ids broadcast against one
    // corpus scan; a sort-merge here would shuffle every vector
    val plan = finalPlan(llm.Similarity.simAdcRerank.run(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "beam⋈corpus vector fetch degenerated to a sort-merge shuffle join")
  }

  test("q2's customer dimension joins as broadcast — the fact side never sort-merges") {
    val plan = finalPlan(analytics.Analytics.q2CustomerSegmentation.run(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "fact⋈dim degenerated to a sort-merge shuffle join")
  }

  test("date-partitioned fact scan prunes to the filtered partition") {
    val plan = finalPlan(sources.Ingest.sPartitionPruning.run(spark, sfDir))
    assert(plan.contains("PartitionFilters:"), "no partition-filter section")
    assert(plan.contains("(o_year"),
      s"year filter did not become a partition filter:\n${plan.take(800)}")
  }

  test("IVF layout probe prunes to the probed cells' partitions") {
    // materialize the inverted file, then prove the probe is partition
    // pruning: the cell predicate must land in PartitionFilters, and the
    // pruned scan must touch strictly fewer files than the full layout
    llm.Similarity.simIvfLayout.run(spark, sfDir).collect()
    val probe = llm.Similarity.ivfLayoutProbe(spark, sfDir, Seq(0L, 1L))
    val plan = finalPlan(probe)
    assert(plan.contains("PartitionFilters: [cell"),
      s"cell predicate did not become a partition filter:\n${plan.take(800)}")
    // inputFiles ignores filters — read the actually-executed scan's
    // numFiles metric instead (populated by running this exact plan)
    val exec = probe.queryExecution.executedPlan
    exec.execute().count()
    val scanned = exec.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head.metrics("numFiles").value
    val allFiles = spark.read
      .parquet(llm.Similarity.ivfLayoutPath(spark, sfDir)).inputFiles.length
    assert(scanned < allFiles,
      s"probe read $scanned of $allFiles files — no pruning")
  }

  test("bucketed co-located join runs without exchanging either join side") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val plan = finalPlan(operators.Relational.jBucketedColocated.run(spark, sfDir))
      assert(plan.contains("SortMergeJoin"))
      // bucket layout satisfies the join's distribution: the only exchanges
      // allowed are the post-join groupBy/orderBy, never on the join keys
      assert(!plan.contains("hashpartitioning(o_custkey"),
        "orders side re-shuffled despite bucketing")
      assert(!plan.contains("hashpartitioning(c_custkey"),
        "customer side re-shuffled despite bucketing")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("bucketed layout re-registered in a fresh catalog keeps co-location and results") {
    val first = operators.Relational.jBucketedColocated.run(spark, sfDir)
      .collect().map(_.toSeq)
    // simulate a new session: drop ONLY the catalog entries (layout files
    // and their _graft_buckets_ok marker stay) → the next run must take the
    // CREATE TABLE ... LOCATION re-registration path, not a rewrite
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_bkt_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = operators.Relational.jBucketedColocated.run(spark, sfDir)
      val again = df.collect().map(_.toSeq)
      assert(again === first, "re-registered layout changed results")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning(o_custkey") &&
        !plan.contains("hashpartitioning(c_custkey"),
        "re-registered external table lost bucket co-location")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("domain filter broadcasts the per-source verdict table back to the doc scan") {
    val plan = finalPlan(llm.Curation.cDomainFilter.run(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "docs⋈verdicts degenerated to a sort-merge shuffle join")
  }

  test("overlap matrix joins on digests only — document text never reaches the join") {
    val df = llm.Curation.cOverlapMatrix.run(spark, sfDir)
    val plan = finalPlan(df)
    // the self-join operates on (source, fp) pairs; text is consumed by
    // md5() inside the scan-side projection and must not appear in any
    // exchange or join operator
    val joinSection = plan.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange")).mkString("\n")
    assert(!joinSection.contains("text"),
      s"document text leaked past the digest projection:\n$joinSection")
  }

  test("top-k per group plans a WindowGroupLimit, not a full per-group sort") {
    val plan = finalPlan(analytics.Analytics.wTopkPerGroup.run(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing — window materializes full groups:\n${plan.take(800)}")
  }

  test("sorted stage read pushes the shipdate range into the parquet scan") {
    val plan = finalPlan(sources.Ingest.sSortedSkipping.run(spark, sfDir))
    // the PushedFilters list renders truncated at ~100 chars, so match the
    // upper bound on its (possibly cut) prefix
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("LessThanOrEqual(l_shipda"),
      s"range predicate not pushed to the sorted stage:\n${plan.take(800)}")
  }

  test("cube plans one Expand + aggregate; null-safe join broadcasts the dim") {
    val cubePlan = finalPlan(operators.Aggregates.aCubeMatrix.run(spark, sfDir))
    assert(cubePlan.contains("Expand"),
      s"cube lost its Expand fan-out:\n${cubePlan.take(600)}")
    val nsPlan = finalPlan(operators.Relational.jNullSafeJoin.run(spark, sfDir))
    assert(nsPlan.contains("BroadcastHashJoin"),
      s"null-safe join degenerated from a broadcast equi join:\n${nsPlan.take(600)}")
    assert(!nsPlan.contains("BroadcastNestedLoopJoin") && !nsPlan.contains("CartesianProduct"),
      "null-safe join fell back to a nested loop")
  }

  test("window gallery and group median each sort the fact exactly once") {
    // the AQE plan string repeats the tree under "== Initial Plan ==";
    // count exchanges in the final section only
    def finalSection(p: String): String = p.split("== Initial Plan ==").head
    // every gallery function shares one (o_custkey, date, key) sort; the
    // only other exchange is the final presentation ORDER BY
    val gallery = finalSection(finalPlan(analytics.Analytics.wWindowGallery.run(spark, sfDir)))
    assert("hashpartitioning".r.findAllIn(gallery).size === 1,
      s"gallery windows stopped sharing their shuffle:\n${gallery.take(800)}")
    val median = finalSection(finalPlan(operators.Aggregates.aGroupMedian.run(spark, sfDir)))
    assert("hashpartitioning".r.findAllIn(median).size === 1,
      s"group median re-shuffled beyond its rank sort:\n${median.take(800)}")
  }

  test("bloom prefilter evaluates at the fact scan, ahead of the exact semi join") {
    val df = operators.Relational.jBloomPrefilter.run(spark, sfDir)
    val plan = finalPlan(df)
    assert(plan.contains("might_contain"),
      s"bloom predicate missing from the physical plan:\n${plan.take(800)}")
    assert(plan.contains("LeftSemi"),
      "exact semi join (false-positive removal) missing")
    // the bloom test must sit in a Filter below the join, not after it
    val filterIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("LeftSemi")
    assert(filterIdx > joinIdx,
      "bloom filter rendered above the join — prefilter not at the scan side")
  }

  test("compaction collapses the fragmented landing without changing content") {
    sources.Ingest.sCompactSmallFiles.run(spark, sfDir).collect()
    def files(name: String) =
      new java.io.File(core.scratch(sfDir, name))
        .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files("s_compact_small") === 64, "fragmented landing not staged as expected")
    assert(files("s_compact_out") === 4,
      "compaction did not produce the target file count")
  }

  test("ORC roundtrip reads back through an ORC scan with the projection pruned") {
    val plan = finalPlan(sources.Ingest.sOrcRoundtrip.run(spark, sfDir))
    assert(plan.contains("Format: ORC") || plan.contains("orc"),
      s"stage not read via ORC:\n${plan.take(600)}")
  }
}
