package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator is a [[QueryDef]] registered in one of the
  * module-level `all` sequences; this object is just the flat union the
  * driver's correctness/bench gates iterate.
  */
object SparkEntry {

  /** Registered modules, in registration order — the module name is the
    * source file the QueryDefs live in (used by [[CoverageMap]] to emit the
    * OPERATORS.md gate registry). */
  lazy val modules: Seq[(String, Seq[QueryDef])] = Seq(
    "operators/Relational.scala" -> operators.Relational.all,
    "operators/Aggregates.scala" -> operators.Aggregates.all,
    "operators/Temporal.scala" -> operators.Temporal.all,
    "operators/Linkage.scala" -> operators.Linkage.all,
    "transform/Cleaning.scala" -> transform.Cleaning.all,
    "analytics/Analytics.scala" -> analytics.Analytics.all,
    "analytics/Behavior.scala" -> analytics.Behavior.all,
    "model/Warehouse.scala" -> model.Warehouse.all,
    "quality/Quality.scala" -> quality.Quality.all,
    "llm/TextOps.scala" -> llm.TextOps.all,
    "llm/Bpe.scala" -> llm.Bpe.all,
    "llm/Curation.scala" -> llm.Curation.all,
    "llm/LangModel.scala" -> llm.LangModel.all,
    "llm/Dedup.scala" -> llm.Dedup.all,
    "llm/Cluster.scala" -> llm.Cluster.all,
    "llm/Similarity.scala" -> llm.Similarity.all,
    "sources/Ingest.scala" -> sources.Ingest.all,
    "sources/Watermark.scala" -> sources.Watermark.all,
    "streaming/Streams.scala" -> streaming.Streams.all,
    "pipeline/Pipeline.scala" -> pipeline.Pipeline.all)

  /** All engine capabilities, one QueryDef per SURVEY.md §2 operator (plus
    * the LLM-pipeline extensions). */
  lazy val defs: Seq[QueryDef] = {
    val ds = modules.flatMap(_._2)
    // a cross-module name collision would silently shadow a QueryDef in the
    // maps below and shrink gate coverage — fail loudly instead
    val dup = ds.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate QueryDef names: ${dup.mkString(", ")}")
    ds
  }

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0): the
    * full extract→validate→dims→facts→audit pipeline in one lineage. */
  def entry(spark: SparkSession): DataFrame =
    pipeline.Pipeline.pipelineE2e.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }.toMap
}
