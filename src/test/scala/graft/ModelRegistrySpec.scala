package graft

import org.apache.spark.sql.functions._
import pipeline.{ModelDef, ModelRegistry}

/** The dbt-style model registry: dependency-ordered execution, loud
  * failures for bad graphs, and the staging-view / mart-table split. */
class ModelRegistrySpec extends SparkSpec {

  test("topoOrder places every model after all of its dependencies, deterministically") {
    val order = pipeline.Pipeline.dailyDag.topoOrder
    val pos = order.zipWithIndex.toMap
    val deps = Map(
      "stg_src" -> Seq("stg_orders"),
      "stg_valid" -> Seq("stg_src", "stg_customer"),
      "dim_customer" -> Seq("stg_customer"),
      "dim_date" -> Seq("stg_orders"),
      "fact_orders" -> Seq("stg_valid", "dim_customer", "dim_date"),
      "fact_daily" -> Seq("fact_orders"))
    for ((m, ds) <- deps; d <- ds)
      assert(pos(d) < pos(m), s"$d must build before $m (order: $order)")
    assert(order === pipeline.Pipeline.dailyDag.topoOrder, "order not stable")
  }

  test("cycles and unknown dependencies fail at construction, not mid-run") {
    val cycleEx = intercept[IllegalArgumentException] {
      new ModelRegistry(Seq(
        ModelDef("a", Seq("b"), mart = false) { (_, _, _) => spark.range(1).toDF() },
        ModelDef("b", Seq("a"), mart = false) { (_, _, _) => spark.range(1).toDF() }
      )).topoOrder
    }
    assert(cycleEx.getMessage.contains("cycle"))
    val unknownEx = intercept[IllegalArgumentException] {
      new ModelRegistry(Seq(
        ModelDef("a", Seq("nope"), mart = false) { (_, _, _) => spark.range(1).toDF() }))
    }
    assert(unknownEx.getMessage.contains("unknown"))
  }

  test("staging models register as temp views; marts materialize as parquet tables") {
    val reg = new ModelRegistry(Seq(
      ModelDef("stg_probe", Nil, mart = false) { (s, _, _) =>
        s.range(5).select(col("id").as("k"))
      },
      ModelDef("mart_probe", Seq("stg_probe"), mart = true) { (_, _, ref) =>
        ref("stg_probe").agg(count(lit(1)).as("n"))
      }))
    val built = reg.run(spark, sfDir)
    // staging → SQL-visible view, lazily inlined
    assert(spark.sql("SELECT count(*) AS c FROM graft_mdl_stg_probe")
      .head().getLong(0) === 5L)
    // mart → real files on disk, and the returned frame reads them
    val loc = new java.io.File(core.scratch(sfDir, "marts/mart_probe"))
    assert(loc.isDirectory && loc.listFiles().nonEmpty, "mart not materialized")
    assert(built("mart_probe").head().getLong(0) === 5L)
  }

  test("the corpus DAG topo-orders its stages and packs consistent shard offsets") {
    val order = pipeline.Pipeline.corpusDag.topoOrder
    val stages = Seq("stg_corpus_raw", "stg_corpus_norm", "stg_corpus_kept",
      "mart_corpus", "mart_packed", "mart_shards")
    for (Seq(a, b) <- stages.sliding(2))
      assert(order.indexOf(a) < order.indexOf(b), s"$a not ordered before $b")
    val outs = pipeline.Pipeline.corpusDag.run(spark, sfDir,
      viewPrefix = "graft_corpus_", martPrefix = "corpus_marts")
    // re-verify the packed offsets on the driver: within each shard,
    // tok_start must be the exact running sum of earlier docs' tokens
    val packed = outs("mart_packed")
      .select("shard", "doc_id", "n_toks", "tok_start")
      .orderBy("shard", "doc_id").collect()
    var curShard = -1L
    var running = 0L
    for (r <- packed) {
      val (shard, toks, start) = (r.getLong(0), r.getLong(2), r.getLong(3))
      if (shard != curShard) { curShard = shard; running = 0L }
      assert(start === running,
        s"shard $shard doc ${r.getLong(1)}: tok_start $start != running sum $running")
      running += toks
    }
  }

  test("the registry-built pipeline marts agree with the summary row") {
    // collect the summary BEFORE re-running the dag: each run overwrites
    // the mart files, invalidating frames handed out by a previous run
    val summary = pipeline.Pipeline.pipelineE2e.run(spark, sfDir).head()
    val built = pipeline.Pipeline.dailyDag.run(spark, sfDir)
    assert(built("fact_orders").count() === summary.getAs[Long]("fact_rows"))
    assert(built("fact_daily").count() === summary.getAs[Long]("fact_daily_rows"))
    assert(built("dim_customer").count() === summary.getAs[Long]("dim_customer_rows"))
  }
}
