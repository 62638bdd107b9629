package graft.operators

import graft.{QueryDef, core}
import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scan / projection / predicate / dedup / join / set-op operators
  * (SURVEY.md §2.1, §2.2, §2.4, §2.5, §2.8).
  *
  * Several operators exist to *repair* defects (duplicates, orphans) that the
  * driver's clean synthetic tables don't contain, so those queries first
  * inject defects deterministically (`key % k` predicates, mirrored verbatim
  * in the oracle SQL) and then demonstrate the repair. That keeps the
  * operator's interesting path exercised end-to-end on both engines.
  */
object Relational {

  /** S1/P1/O1 — projected full scan with extraction ordering (reference
    * `extractors/postgres_extractor.py:52–60`). Catalyst prunes the parquet
    * scan to exactly these five columns (visible as ReadSchema in explain). */
  val s1ScanProject: QueryDef = QueryDef(
    "s1_scan_project",
    Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
      FROM orders
      ORDER BY o_orderdate, o_orderkey
    """)) { (spark, dir) =>
    tbl(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy("o_orderdate", "o_orderkey")
  }

  /** S2/S4 — high-watermark incremental scan (reference
    * `extractors/postgres_extractor.py:41–50`). The predicate is pushed into
    * the parquet scan (PushedFilters), which at 100 TB means only row groups
    * past the watermark are read. */
  val s2IncrementalScan: QueryDef = QueryDef(
    "s2_incremental_scan",
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      FROM orders
      WHERE o_orderdate > TIMESTAMP '1997-06-01 00:00:00'
      ORDER BY o_orderdate, o_orderkey
    """)) { (spark, dir) =>
    tbl(spark, dir, "orders")
      .filter(col("o_orderdate") > lit("1997-06-01 00:00:00").cast(TimestampNTZType))
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .orderBy("o_orderdate", "o_orderkey")
  }

  /** S6 — incremental scan by *lexicographic string* watermark, the Mongo
    * ISO-date-string pattern (reference `extractors/mongo_extractor.py:50–54`). */
  val s6StringWatermark: QueryDef = QueryDef(
    "s6_string_watermark",
    Some("""
      SELECT doc_id, source, lang, n_chars
      FROM documents
      WHERE source > 'src4'
      ORDER BY doc_id
    """)) { (spark, dir) =>
    tbl(spark, dir, "documents")
      .filter(col("source") > lit("src4"))
      .select("doc_id", "source", "lang", "n_chars")
      .orderBy("doc_id")
  }

  /** P2–P5 — predicate bundle: IS NOT NULL, IN-list, BETWEEN (reference
    * `stg_orders.sql:19`, `analytics_queries.sql:64, 183`). */
  val pPredicates: QueryDef = QueryDef(
    "p_predicates",
    Some("""
      SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_returnflag IS NOT NULL
        AND l_linestatus IN ('O', 'F')
        AND l_quantity BETWEEN 10 AND 40
      ORDER BY l_orderkey, l_linenumber
    """)) { (spark, dir) =>
    tbl(spark, dir, "lineitem")
      .filter(col("l_returnflag").isNotNull &&
        col("l_linestatus").isin("O", "F") &&
        col("l_quantity").between(10, 40))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Injected-duplicate lineitem: the base table plus a copy of every row
    * whose orderkey % 7 = 0 (deterministic, mirrored in oracles). */
  private def lineitemWithDups(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
    li.unionAll(li.filter(col("l_orderkey") % 7 === 0))
  }
  private val lineitemWithDupsSql =
    "SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem WHERE l_orderkey % 7 = 0"

  /** D1–D3 — deterministic keep-first dedup via ROW_NUMBER with an explicit
    * tie-breaker (reference `transformers/data_transformer.py:38–42`; pandas
    * `keep="first"` made order-stable per SURVEY.md §7.4). Scales as one
    * hash-shuffle on the key — no global sort. */
  val d1DedupKeepFirst: QueryDef = QueryDef(
    "d1_dedup_keep_first",
    Some(s"""
      WITH with_dups AS ($lineitemWithDupsSql),
      ranked AS (
        -- base data has duplicate (orderkey, linenumber) keys with different
        -- attributes → tie-break on every output column for determinism
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate,
               -- NULLS FIRST pinned: Spark asc defaults nulls-first, DuckDB
               -- nulls-last — harmless while these columns are non-null, but
               -- pinned so a nullable future column can't silently diverge
               row_number() OVER (PARTITION BY l_orderkey, l_linenumber
                                  ORDER BY l_shipdate NULLS FIRST, l_suppkey NULLS FIRST,
                                           l_quantity NULLS FIRST, l_extendedprice NULLS FIRST) AS rn
        FROM with_dups)
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
      FROM ranked WHERE rn = 1
      ORDER BY l_orderkey, l_linenumber
    """)) { (spark, dir) =>
    val w = Window.partitionBy("l_orderkey", "l_linenumber")
      .orderBy(col("l_shipdate").asc_nulls_first, col("l_suppkey").asc_nulls_first,
        col("l_quantity").asc_nulls_first, col("l_extendedprice").asc_nulls_first)
    lineitemWithDups(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate", "l_suppkey")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Orders with injected orphans (customer keys that don't exist). */
  private def ordersWithOrphans(spark: SparkSession, dir: String): DataFrame = {
    val o = tbl(spark, dir, "orders")
    o.select("o_orderkey", "o_custkey", "o_totalprice")
      .unionAll(
        o.filter(col("o_orderkey") % 11 === 0)
          .select(
            (col("o_orderkey") + 10000000L).as("o_orderkey"),
            (col("o_custkey") + 10000000L).as("o_custkey"),
            col("o_totalprice")))
  }
  private val ordersWithOrphansSql = """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey + 10000000, o_totalprice
      FROM orders WHERE o_orderkey % 11 = 0"""

  /** Bucketed co-located join (beyond parity; builder brief "bucketing for
    * co-located joins"): both sides are written `bucketBy` the join key into
    * catalog tables, so the join reads co-located buckets and the fact side
    * never shuffles at join time — the storage layout that makes repeated
    * large-fact⋈large-dim joins affordable at 100 TB (pay the bucketing
    * shuffle once at write, never per query — and here never per JOB
    * either: the layout persists in the warehouse dir, keyed by input dir
    * AND a source-content signature, and a later session re-registers it as
    * an external bucketed table instead of rewriting; a regenerated source
    * changes the signature, so stale layouts can never serve). The oracle
    * is the plain join, proving layout changes nothing semantically. */
  val jBucketedColocated: QueryDef = QueryDef(
    "j_bucketed_colocated",
    Some("""
      SELECT c_mktsegment,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment
    """)) { (spark, dir) =>
    val tag = s"${dirTag(dir)}_${sourceSig(spark, dir, "orders", "customer")}"
    val (ot, ct) = (s"graft_bkt_orders_$tag", s"graft_bkt_customer_$tag")
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ensureBucketed(t: String, key: String, schemaDdl: String)
        (src: => org.apache.spark.sql.DataFrame): Unit =
      if (!spark.catalog.tableExists(t)) {
        val loc = new org.apache.hadoop.fs.Path(wh, t)
        val marker = new org.apache.hadoop.fs.Path(loc, "_graft_buckets_ok")
        if (fs.exists(marker)) {
          // complete layout from an earlier session: register, don't rewrite
          spark.sql(s"CREATE TABLE $t ($schemaDdl) USING parquet " +
            s"CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS LOCATION '$loc'")
        } else {
          fs.delete(loc, true) // clear any partial layout from a dead run
          // external from the start (explicit path): a catalog DROP must
          // never delete the shared layout files
          src.write.bucketBy(8, key).sortBy(key)
            .option("path", loc.toString).format("parquet").saveAsTable(t)
          fs.create(marker).close()
        }
      }
    ensureBucketed(ot, "o_custkey", "o_custkey BIGINT, o_totalprice DOUBLE")(
      tbl(spark, dir, "orders").select("o_custkey", "o_totalprice"))
    ensureBucketed(ct, "c_custkey", "c_custkey BIGINT, c_mktsegment STRING")(
      tbl(spark, dir, "customer").select("c_custkey", "c_mktsegment"))
    spark.table(ot)
      .join(spark.table(ct), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), moneySumD(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** D4/J6 — referential-integrity filter as a left-semi join (reference
    * `transformers/data_transformer.py:179–219`). The dimension side is
    * broadcast, so the fact side never shuffles. */
  val d4IntegritySemiJoin: QueryDef = QueryDef(
    "d4_integrity_semi_join",
    Some(s"""
      WITH src AS ($ordersWithOrphansSql)
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM src
      WHERE o_custkey IN (SELECT c_custkey FROM customer)
      ORDER BY o_orderkey
    """)) { (spark, dir) =>
    val cust = tbl(spark, dir, "customer").select(col("c_custkey").as("o_custkey"))
    ordersWithOrphans(spark, dir)
      .join(broadcast(cust), Seq("o_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** D5 — rejected-record accounting from the anti side (reference
    * `etl_daily_pipeline.py:133–135`). */
  val d5RejectAccounting: QueryDef = QueryDef(
    "d5_reject_accounting",
    Some(s"""
      WITH src AS ($ordersWithOrphansSql)
      SELECT count(*) AS records_rejected
      FROM src
      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    """)) { (spark, dir) =>
    val cust = tbl(spark, dir, "customer").select(col("c_custkey").as("o_custkey"))
    ordersWithOrphans(spark, dir)
      .join(broadcast(cust), Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("records_rejected"))
  }

  /** J1–J3 — star join: facts against three broadcast dimensions
    * (reference `analytics_queries.sql:23–24, 62–63, 102–103`). */
  val j1StarJoin: QueryDef = QueryDef(
    "j1_star_join",
    Some("""
      SELECT r_name, n_name,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2
      ORDER BY 1, 2
    """)) { (spark, dir) =>
    tbl(spark, dir, "orders")
      .join(broadcast(tbl(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(tbl(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(tbl(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(moneySumD(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")
  }

  /** J4 — surrogate-key resolution: facts LEFT JOIN dimension on the business
    * key; unmatched keys surface as NULLs (reference
    * `etl_daily_pipeline.py:199–208`, `fact_orders.sql:14–20`). */
  val j4LeftSkResolution: QueryDef = QueryDef(
    "j4_left_sk_resolution",
    Some(s"""
      WITH src AS ($ordersWithOrphansSql)
      SELECT o_orderkey, o_totalprice, c_custkey AS customer_key, c_mktsegment
      FROM src LEFT JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey
    """)) { (spark, dir) =>
    val cust = tbl(spark, dir, "customer")
    ordersWithOrphans(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("c_custkey").as("customer_key"), col("c_mktsegment"))
      .orderBy("o_orderkey")
  }

  /** J7/Q3 — FK orphan detection as a left-anti join (reference
    * `airflow/dags/data_quality_check.py:115–135`). */
  val j7AntiOrphans: QueryDef = QueryDef(
    "j7_anti_orphans",
    Some(s"""
      WITH src AS ($ordersWithOrphansSql)
      SELECT o_orderkey, o_custkey
      FROM src
      WHERE o_custkey IS NOT NULL
        AND o_custkey NOT IN (SELECT c_custkey FROM customer)
      ORDER BY o_orderkey
    """)) { (spark, dir) =>
    val cust = tbl(spark, dir, "customer").select(col("c_custkey").as("o_custkey"))
    ordersWithOrphans(spark, dir)
      .filter(col("o_custkey").isNotNull)
      .join(broadcast(cust), Seq("o_custkey"), "left_anti")
      .select("o_orderkey", "o_custkey")
      .orderBy("o_orderkey")
  }

  /** J8 — correlated scalar subquery in a predicate, run through Spark SQL so
    * Catalyst's RewriteCorrelatedScalarSubquery decorrelates it (reference
    * `analytics_queries.sql:158–161`; SURVEY.md §2.5 J8). Formulated as
    * price × count > sum (all exact decimal/integer math) instead of
    * price > avg so both engines compare identical exact values. */
  val j8CorrelatedSubquery: QueryDef = QueryDef(
    "j8_correlated_subquery",
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE CAST(o_totalprice AS DECIMAL(18,2))
              * (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
            > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders o2
               WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey
    """)) { (spark, dir) =>
    tbl(spark, dir, "orders").createOrReplaceTempView("graft_orders_j8")
    spark.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM graft_orders_j8 o
      WHERE CAST(o_totalprice AS DECIMAL(18,2))
              * (SELECT count(*) FROM graft_orders_j8 o2 WHERE o2.o_custkey = o.o_custkey)
            > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM graft_orders_j8 o2
               WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey
    """)
  }

  /** KEYSET PAGINATION (beyond parity) — the scale-correct form of "give
    * me the next page": resume from a (date, key) cursor with a
    * lexicographic predicate + LIMIT, instead of OFFSET — OFFSET n scans
    * and discards n rows on every page (page 10,000 of a 100 TB export
    * reads half the table; the cursor form reads ~one page regardless of
    * depth, and the date predicate pushes into the scan). The row
    * comparison is spelled as the expanded OR form on both engines so
    * null semantics and pushdown behave identically. */
  val oKeysetPagination: QueryDef = QueryDef(
    "o_keyset_pagination",
    Some("""
      SELECT o_orderkey, o_orderdate, CAST(o_totalprice AS DOUBLE) AS o_totalprice
      FROM orders
      WHERE o_orderdate > DATE '1996-06-15'
         OR (o_orderdate = DATE '1996-06-15' AND o_orderkey > 4000)
      ORDER BY o_orderdate, o_orderkey
      LIMIT 100
    """)) { (spark, dir) =>
    val cursorDate = to_date(lit("1996-06-15"))
    tbl(spark, dir, "orders")
      .filter(col("o_orderdate") > cursorDate ||
        (col("o_orderdate") === cursorDate && col("o_orderkey") > 4000))
      .orderBy("o_orderdate", "o_orderkey")
      .limit(100)
      .select(col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice").cast(DoubleType).as("o_totalprice"))
  }

  /** O4 — set operations (available beyond parity, SURVEY.md §2.8):
    * INTERSECT of high-value buyers and building-segment customers. */
  val o4SetOps: QueryDef = QueryDef(
    "o4_set_ops",
    Some("""
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
      INTERSECT
      SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      ORDER BY custkey
    """)) { (spark, dir) =>
    val buyers = tbl(spark, dir, "orders")
      .filter(col("o_totalprice") > 150000)
      .select(col("o_custkey").as("custkey"))
    val building = tbl(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    buyers.intersect(building).orderBy("custkey")
  }

  /** Salted SKEW JOIN (beyond parity; completes the skew family next to
    * a_salted_skew_agg's salted aggregation): events are brutally skewed
    * on event_type (a handful of distinct values — at 100 TB one key can
    * be 30% of all rows, and an unsalted shuffle join puts that key on
    * ONE reducer). Mitigation: salt the big side with pmod(hash(id), 8)
    * and REPLICATE the small side 8× (explode over the salt range), then
    * join on (key, salt) — the hot key's rows spread over 8 reducers.
    * The small side here fits a broadcast (which would bypass the demo),
    * so the shuffle topology is pinned with a SHUFFLE_HASH hint — the
    * production case this models is a dim too large to broadcast. The
    * post-join per-type rollup re-shuffles the skewed key but partial
    * aggregation reduces each task to one row per type first, so the hot
    * reducer receives task-count rows, not data-sized rows. Salt choice
    * never affects results (the oracle is the plain unsalted join). */
  val jSaltedSkewJoin: QueryDef = QueryDef(
    "j_salted_skew_join",
    Some("""
      WITH dim AS (
        SELECT event_type, CAST(length(event_type) AS BIGINT) AS type_weight
        FROM (SELECT DISTINCT event_type FROM events))
      SELECT e.event_type, max(d.type_weight) AS type_weight,
             count(*) AS n_events,
             CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events e JOIN dim d USING (event_type)
      GROUP BY e.event_type
      ORDER BY event_type
    """)) { (spark, dir) =>
    val nSalts = 8
    val ev = core.events(spark, dir).select("event_id", "event_type", "value")
    val dim = ev.select("event_type").distinct()
      .select(col("event_type"), length(col("event_type")).cast(LongType).as("type_weight"))
    val salted = ev.withColumn("__salt", pmod(hash(col("event_id")), lit(nSalts)))
    val dimReplicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
      .hint("shuffle_hash")
    salted.join(dimReplicated, Seq("event_type", "__salt"))
      .groupBy("event_type")
      .agg(max(col("type_weight")).as("type_weight"),
        count(lit(1)).as("n_events"),
        moneySumD(col("value")).as("total_value"))
      .orderBy("event_type")
  }

  /** BLOOM-PREFILTERED SEMI JOIN (beyond parity) — the explicit form of
    * the runtime row-level filter Spark's optimizer injects only when its
    * cost model chooses to: a bloom filter is built over the SELECTIVE
    * side's join keys ([[graft.functions.GraftExtensions]] surfaces the
    * engine's own `BloomFilterAggregate`/`BloomFilterMightContain`), lands
    * in a scalar subquery, and drops non-matching fact rows AT THE SCAN —
    * before any exchange. The exact semi join afterwards removes the
    * false positives, so results are exact (bloom filters have no false
    * negatives) and the oracle is the plain `IN` semi join. At 100 TB the
    * few-MB filter reaches every scan task and eliminates ~the
    * non-matching fraction of shuffle bytes — the difference between
    * shuffling 100 TB and shuffling the 20% that survives. */
  val jBloomPrefilter: QueryDef = QueryDef(
    "j_bloom_prefilter",
    Some("""
      SELECT l_returnflag, count(*) AS n_lines,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_orderkey IN
        (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      GROUP BY 1
      ORDER BY l_returnflag
    """)) { (spark, dir) =>
    tbl(spark, dir, "orders").createOrReplaceTempView("g_bloom_orders")
    tbl(spark, dir, "lineitem").createOrReplaceTempView("g_bloom_lineitem")
    spark.sql("""
      WITH sel AS (
        SELECT o_orderkey FROM g_bloom_orders WHERE o_orderpriority = '1-URGENT'),
      pre AS (
        SELECT l_orderkey, l_returnflag, l_extendedprice
        FROM g_bloom_lineitem
        WHERE graft_might_contain(
          (SELECT graft_bloom_agg(xxhash64(o_orderkey), CAST(100000 AS BIGINT)) FROM sel),
          xxhash64(l_orderkey)))
      SELECT l_returnflag, count(*) AS n_lines,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM pre LEFT SEMI JOIN sel ON l_orderkey = o_orderkey
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  }

  /** NULL-SAFE equi join (`<=>` / `IS NOT DISTINCT FROM`) — joining on a
    * NULLABLE key with null-matches-null semantics, the dimension-lookup
    * case where "unknown" is itself a dimension member. Spark plans `<=>`
    * as a true equi join (hashable — here a broadcast hash join on the
    * 50-row dim), NOT the nested-loop a `coalesce`-to-sentinel rewrite
    * risks colliding with real values. The null bucket (o_custkey % 50 =
    * 0) carries ~2% of rows and lands on the 'b_null' member on both
    * engines. */
  val jNullSafeJoin: QueryDef = QueryDef(
    "j_null_safe_join",
    Some("""
      WITH dim AS (
        SELECT CASE WHEN i = 0 THEN NULL ELSE i END AS bucket,
               CASE WHEN i = 0 THEN 'b_null' ELSE 'b' || i END AS label
        FROM range(0, 50) t(i)),
      o AS (
        SELECT CASE WHEN o_custkey % 50 = 0 THEN NULL
                    ELSE o_custkey % 50 END AS bucket
        FROM orders)
      SELECT d.label, count(*) AS n
      FROM o JOIN dim d ON o.bucket IS NOT DISTINCT FROM d.bucket
      GROUP BY 1
      ORDER BY label
    """)) { (spark, dir) =>
    val dim = spark.range(0, 50).select(
      when(col("id") === 0, lit(null).cast(LongType))
        .otherwise(col("id")).as("d_bucket"),
      when(col("id") === 0, "b_null")
        .otherwise(concat(lit("b"), col("id"))).as("label"))
    val o = tbl(spark, dir, "orders").select(
      when(col("o_custkey") % 50 === 0, lit(null).cast(LongType))
        .otherwise(col("o_custkey") % 50).as("bucket"))
    o.join(broadcast(dim), col("bucket") <=> col("d_bucket"))
      .groupBy("label").agg(count(lit(1)).as("n"))
      .orderBy("label")
  }

  val all: Seq[QueryDef] = Seq(
    s1ScanProject, s2IncrementalScan, s6StringWatermark, pPredicates,
    d1DedupKeepFirst, d4IntegritySemiJoin, d5RejectAccounting,
    j1StarJoin, j4LeftSkResolution, j7AntiOrphans, j8CorrelatedSubquery,
    jBucketedColocated, jSaltedSkewJoin, o4SetOps, oKeysetPagination,
    jBloomPrefilter, jNullSafeJoin)
}
