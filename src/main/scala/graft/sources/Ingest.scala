package graft.sources

import graft.{QueryDef, core}
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-store ingestion (S5) and the parquet stage-handoff round-trip
  * (S7) — the reference's MongoDB extractor and Airflow task boundaries
  * (reference `extractors/mongo_extractor.py:45–73`,
  * `airflow/dags/etl_daily_pipeline.py:85–87`). */
object Ingest {

  // Stage outputs land in core.scratch (keyed by input dir so
  // sf0.001/sf0.01 runs don't collide).

  /** S5 — Mongo-style document ingestion: documents are serialized to JSON
    * lines (with a synthetic `_id`, as a document store would carry), read
    * back with **schema inference**, `_id` dropped, and flattened to columns
    * (reference `mongo_extractor.py:59–73`: `pd.DataFrame(documents)` +
    * `drop('_id')`). The JSON write/read is partition-parallel on both
    * sides — at scale this is the standard files-based landing zone. */
  val s5DocIngest: QueryDef = QueryDef(
    "s5_doc_ingest",
    Some("""
      SELECT doc_id, lang, source, n_chars, text
      FROM documents
      ORDER BY doc_id
    """)) { (spark, dir) =>
    val jsonDir = scratch(dir, "s5_docs_json")
    tbl(spark, dir, "documents")
      .select(
        concat(lit("oid_"), col("doc_id").cast(StringType)).as("_id"),
        col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").json(jsonDir)
    spark.read.json(jsonDir) // schema inferred, not declared — the Mongo path
      .drop("_id")
      .select("doc_id", "lang", "source", "n_chars", "text")
      .orderBy("doc_id")
  }

  /** S7 — parquet sink/scan stage handoff: write a projected/filtered stage
    * output, read it back, and aggregate — proving the round-trip preserves
    * schema and values exactly (reference `etl_daily_pipeline.py:85–87,
    * 121–123`: every task boundary is a parquet file). */
  val s7ParquetRoundtrip: QueryDef = QueryDef(
    "s7_parquet_roundtrip",
    Some("""
      SELECT o_orderstatus,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders
      WHERE o_totalprice > 50000
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """)) { (spark, dir) =>
    val stageDir = scratch(dir, "s7_stage")
    tbl(spark, dir, "orders")
      .filter(col("o_totalprice") > 50000)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(stageDir)
    spark.read.parquet(stageDir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), moneySumD(col("o_totalprice")).as("revenue"))
      .orderBy("o_orderstatus")
  }

  /** Partition-pruned scan (beyond parity; builder brief "partition
    * pruning"): the fact table is written date-partitioned (`partitionBy`
    * year — at 100 TB this is the physical layout every fact table needs),
    * then a year-filtered read touches ONLY that partition's files: the
    * filter resolves at the driver from directory names (`PartitionFilters`
    * in the plan, asserted by PlanSpec), so a 1-year query over a 7-year
    * table reads ~1/7 of the bytes. The oracle replays the same predicate
    * over the unpartitioned table, proving layout neutrality. */
  val sPartitionPruning: QueryDef = QueryDef(
    "s_partition_pruning",
    Some("""
      SELECT o_orderstatus,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders
      WHERE year(o_orderdate) = 1995
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """)) { (spark, dir) =>
    val partDir = scratch(dir, "s_fact_by_year")
    tbl(spark, dir, "orders")
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        year(col("o_orderdate")).as("o_year"))
      .write.mode("overwrite").partitionBy("o_year").parquet(partDir)
    spark.read.parquet(partDir)
      .filter(col("o_year") === 1995)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), moneySumD(col("o_totalprice")).as("revenue"))
      .orderBy("o_orderstatus")
  }

  val all: Seq[QueryDef] = Seq(s5DocIngest, s7ParquetRoundtrip, sPartitionPruning)
}
