package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator is a [[QueryDef]] registered in one of the
  * module-level `all` sequences; this object is just the flat union the
  * driver's correctness/bench gates iterate.
  */
object SparkEntry {

  /** All engine capabilities, one QueryDef per SURVEY.md §2 operator (plus
    * the LLM-pipeline extensions). */
  lazy val defs: Seq[QueryDef] = {
    val ds =
      operators.Relational.all ++
        operators.Aggregates.all ++
        operators.Temporal.all ++
        transform.Cleaning.all ++
        analytics.Analytics.all ++
        analytics.Behavior.all ++
        model.Warehouse.all ++
        quality.Quality.all ++
        llm.TextOps.all ++
        llm.Curation.all ++
        llm.Dedup.all ++
        llm.Cluster.all ++
        llm.Similarity.all ++
        sources.Ingest.all ++
        sources.Watermark.all ++
        streaming.Streams.all ++
        pipeline.Pipeline.all
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
