package graft.transform

import graft.{QueryDef, core}
import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's cleaning/validation layer (reference
  * `transformers/data_transformer.py:24–219`) as pure `DataFrame =>
  * DataFrame` functions, plus driver-gate queries that inject the defects the
  * reference's unit fixtures seed (FIXTURES.md §A) and repair them.
  *
  * Everything is built from codegen'd `functions._` expressions — no UDFs —
  * so each cleaner is a narrow projection over one pass of the data and
  * fuses into a single WholeStageCodegen at any scale.
  */
object Cleaning {

  /** D1–D3 — deterministic keep-first dedup: pandas `drop_duplicates` made
    * order-stable with an explicit tie-breaker (SURVEY.md §7.4 risk 1). */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], tieBreakers: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreakers: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** F1 — status normalization: upper(trim) (reference `data_transformer.py:59`). */
  def normalizeStatus(c: Column): Column = upper(trim(c))

  /** F2 — email normalization: lower(trim) (reference `data_transformer.py:98`). */
  def normalizeEmail(c: Column): Column = lower(trim(c))

  /** F4 — conditional recompute: COALESCE(total, qty × price)
    * (reference `data_transformer.py:51–56`). */
  def recomputeTotal(total: Column, qty: Column, price: Column): Column =
    coalesce(total, qty * price)

  /** F5 — domain validation with default (reference `data_transformer.py:107–115`). */
  def validateDomain(c: Column, valid: Seq[String], default: String): Column =
    when(c.isin(valid: _*), c).otherwise(lit(default))

  /** F6 — clamp to [lo, hi] (reference `data_transformer.py:150–155`). */
  def clamp(c: Column, lo: Column, hi: Column): Column =
    when(c < lo, lo).when(c > hi, hi).otherwise(c)

  /** F7 — rating → sentiment bucketing (reference `data_transformer.py:164–169`,
    * SQL twin `stg_reviews.sql:14–18`). */
  def sentiment(rating: Column): Column =
    when(rating <= 2, "negative").when(rating === 3, "neutral").otherwise("positive")

  /** D4 — referential-integrity filter; returns (kept, rejectedCount is the
    * caller's anti-join — see [[graft.operators.Relational.d5RejectAccounting]]). */
  def integrityFilter(facts: DataFrame, dim: DataFrame, key: String): DataFrame =
    facts.join(broadcast(dim.select(key).distinct()), Seq(key), "left_semi")

  // ---------------------------------------------------------------------

  /** cleanOrders over defect-injected lineitem: dup rows (key%101), null
    * amounts (key%37), mixed-case status (key%5) — the `sample_orders`
    * defects of FIXTURES.md §A at table scale. Repairs: keep-first dedup,
    * COALESCE-recompute, upper(trim), calendar derivations (F9, 0=Monday). */
  val cleanOrders: QueryDef = QueryDef(
    "clean_orders",
    Some("""
      WITH defects AS (
        SELECT l_orderkey, l_linenumber, l_quantity,
               CASE WHEN l_orderkey % 37 = 0 THEN NULL ELSE l_extendedprice END AS l_extendedprice,
               CASE WHEN l_orderkey % 5 = 0 THEN lower(l_returnflag) ELSE l_returnflag END AS l_returnflag,
               l_discount, l_shipdate
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, l_quantity,
               CASE WHEN l_orderkey % 37 = 0 THEN NULL ELSE l_extendedprice END,
               CASE WHEN l_orderkey % 5 = 0 THEN lower(l_returnflag) ELSE l_returnflag END,
               l_discount, l_shipdate
        FROM lineitem WHERE l_orderkey % 101 = 0),
      dedup AS (
        -- the base table itself contains duplicate (orderkey, linenumber)
        -- keys with DIFFERENT attributes, so keep-first must tie-break on
        -- every surviving column (NULLS FIRST pinned: Spark's asc default
        -- is nulls-first, DuckDB's is nulls-last)
        SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
                                     ORDER BY l_shipdate NULLS FIRST,
                                              l_quantity NULLS FIRST,
                                              l_extendedprice NULLS FIRST,
                                              l_returnflag NULLS FIRST,
                                              l_discount NULLS FIRST) AS rn
        FROM defects)
      SELECT l_orderkey, l_linenumber,
             coalesce(l_quantity, 1.0) AS quantity,
             coalesce(l_extendedprice, l_quantity * 950.0) AS total_amount,
             upper(trim(l_returnflag)) AS status,
             CAST(month(l_shipdate) AS INTEGER) AS order_month,
             CAST(year(l_shipdate) AS INTEGER) AS order_year,
             CAST(isodow(CAST(l_shipdate AS DATE)) - 1 AS INTEGER) AS order_day_of_week
      FROM dedup WHERE rn = 1
      ORDER BY l_orderkey, l_linenumber
    """)) { (spark, dir) =>
    val li = tbl(spark, dir, "lineitem")
    val defected = li.select(
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      when(col("l_orderkey") % 37 === 0, lit(null)).otherwise(col("l_extendedprice"))
        .as("l_extendedprice"),
      when(col("l_orderkey") % 5 === 0, lower(col("l_returnflag"))).otherwise(col("l_returnflag"))
        .as("l_returnflag"),
      col("l_discount"), col("l_shipdate"))
    val withDups = defected.unionAll(defected.filter(col("l_orderkey") % 101 === 0))
    dedupKeepFirst(withDups, Seq("l_orderkey", "l_linenumber"),
      Seq(col("l_shipdate").asc_nulls_first, col("l_quantity").asc_nulls_first,
        col("l_extendedprice").asc_nulls_first, col("l_returnflag").asc_nulls_first,
        col("l_discount").asc_nulls_first))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(col("l_quantity"), lit(1.0)).as("quantity"),
        recomputeTotal(col("l_extendedprice"), col("l_quantity"), lit(950.0)).as("total_amount"),
        normalizeStatus(col("l_returnflag")).as("status"),
        month(col("l_shipdate")).as("order_month"),
        year(col("l_shipdate")).as("order_year"),
        dowMon0(col("l_shipdate")).as("order_day_of_week"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** cleanCustomers over defect-injected customer: mixed-case names (%13),
    * null balances (%17), out-of-domain segment (%19) — `sample_customers`
    * defects (FIXTURES.md §A). Repairs: lower(trim), null-fill, clamp,
    * domain-default, as-of account age (F10 with pinned as-of date). */
  val cleanCustomers: QueryDef = QueryDef(
    "clean_customers",
    Some("""
      WITH defects AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 13 = 0 THEN upper(c_name) ELSE c_name END AS c_name,
               CASE WHEN c_custkey % 17 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal,
               CASE WHEN c_custkey % 19 = 0 THEN 'INVALID_SEGMENT' ELSE c_mktsegment END AS c_mktsegment
        FROM customer)
      SELECT c_custkey,
             lower(trim(c_name)) AS name_normalized,
             coalesce(c_acctbal, 0.0) AS acctbal_filled,
             CASE WHEN coalesce(c_acctbal, 0.0) < 0.0 THEN 0.0
                  WHEN coalesce(c_acctbal, 0.0) > 9000.0 THEN 9000.0
                  ELSE coalesce(c_acctbal, 0.0) END AS acctbal_clamped,
             CASE WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY','HOUSEHOLD','FURNITURE')
                  THEN c_mktsegment ELSE 'BUILDING' END AS segment_validated
      FROM defects
      ORDER BY c_custkey
    """)) { (spark, dir) =>
    val segments = Seq("BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE")
    val defected = tbl(spark, dir, "customer").select(
      col("c_custkey"),
      when(col("c_custkey") % 13 === 0, upper(col("c_name"))).otherwise(col("c_name")).as("c_name"),
      when(col("c_custkey") % 17 === 0, lit(null)).otherwise(col("c_acctbal")).as("c_acctbal"),
      when(col("c_custkey") % 19 === 0, lit("INVALID_SEGMENT")).otherwise(col("c_mktsegment"))
        .as("c_mktsegment"))
    val filled = coalesce(col("c_acctbal"), lit(0.0))
    defected.select(
      col("c_custkey"),
      normalizeEmail(col("c_name")).as("name_normalized"),
      filled.as("acctbal_filled"),
      clamp(filled, lit(0.0), lit(9000.0)).as("acctbal_clamped"),
      validateDomain(col("c_mktsegment"), segments, "BUILDING").as("segment_validated"))
      .orderBy("c_custkey")
  }

  /** cleanReviews analog: out-of-range ratings (clamp to [1,5]), null text
    * fill, sentiment bucketing, lenient timestamp parse (F6/F3/F7/F8 on
    * `sample_reviews`, FIXTURES.md §A). Rating is derived deterministically
    * from l_quantity so out-of-range values actually occur. */
  val cleanReviews: QueryDef = QueryDef(
    "clean_reviews",
    Some("""
      WITH src AS (
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_quantity) AS INTEGER) % 8 AS rating,
               CASE WHEN l_orderkey % 23 = 0 THEN NULL ELSE l_comment_stub END AS review_text,
               CASE WHEN l_orderkey % 4 = 0 THEN 'not-a-date'
                    ELSE strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') END AS review_date_raw
        FROM (SELECT *, concat('review for ', CAST(l_partkey AS VARCHAR)) AS l_comment_stub
              FROM lineitem))
      SELECT l_orderkey, l_linenumber,
             CASE WHEN rating < 1 THEN 1 WHEN rating > 5 THEN 5 ELSE rating END AS rating_clamped,
             coalesce(review_text, '') AS review_text,
             CASE WHEN CASE WHEN rating < 1 THEN 1 WHEN rating > 5 THEN 5 ELSE rating END <= 2 THEN 'negative'
                  WHEN CASE WHEN rating < 1 THEN 1 WHEN rating > 5 THEN 5 ELSE rating END = 3 THEN 'neutral'
                  ELSE 'positive' END AS sentiment_category,
             TRY_CAST(review_date_raw AS TIMESTAMP) AS review_date
      FROM src
      ORDER BY l_orderkey, l_linenumber
    """)) { (spark, dir) =>
    val src = tbl(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      // floor() on BOTH sides: Spark's double→int cast truncates while
      // DuckDB's rounds, so the raw casts only agree on integral inputs.
      (floor(col("l_quantity")).cast(IntegerType) % 8).as("rating"),
      when(col("l_orderkey") % 23 === 0, lit(null))
        .otherwise(concat(lit("review for "), col("l_partkey").cast(StringType)))
        .as("review_text"),
      when(col("l_orderkey") % 4 === 0, lit("not-a-date"))
        .otherwise(date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss"))
        .as("review_date_raw"))
    val clamped = clamp(col("rating"), lit(1), lit(5))
    src.select(
      col("l_orderkey"), col("l_linenumber"),
      clamped.as("rating_clamped"),
      coalesce(col("review_text"), lit("")).as("review_text"),
      sentiment(clamped).as("sentiment_category"),
      try_to_timestamp(col("review_date_raw")).cast(TimestampNTZType).as("review_date"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** F10–F21 — scalar-function bundle over orders: date keys, truncation,
    * month arithmetic, formatting, concat, round, nullif, abs, casts
    * (reference sites listed in SURVEY.md §2.3). The as-of computation
    * (`age_days`) takes its "today" from the injected [[graft.RunContext]]
    * rather than an inline literal — the oracle SQL is generated from the
    * same context, so gate and oracle stay in lockstep for any date. */
  def scalarFunctions(ctx: graft.RunContext): QueryDef = QueryDef(
    "scalar_functions",
    Some(s"""
      SELECT o_orderkey,
             upper(trim(o_orderstatus)) AS status_u,
             lower(o_orderpriority) AS priority_l,
             concat_ws(' ', o_orderstatus, o_orderpriority) AS status_priority,
             CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS date_key,
             CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
             date_trunc('month', o_orderdate) AS order_month_start,
             strftime(o_orderdate, '%Y-%m') AS order_ym,
             CAST(date_diff('month', date_trunc('month', TIMESTAMP '1995-01-01 00:00:00'),
                            date_trunc('month', o_orderdate)) AS INTEGER) AS months_since_1995,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '${ctx.asOfDate}') AS INTEGER) AS age_days,
             CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_round1,
             abs(CAST(o_totalprice AS DOUBLE) - 150000.0) AS price_abs_dev,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS price_x2,
             nullif(o_orderstatus, 'O') AS status_nullif_open
      FROM orders
      ORDER BY o_orderkey
    """)) { (spark, dir) =>
    tbl(spark, dir, "orders").select(
      col("o_orderkey"),
      upper(trim(col("o_orderstatus"))).as("status_u"),
      lower(col("o_orderpriority")).as("priority_l"),
      concat_ws(" ", col("o_orderstatus"), col("o_orderpriority")).as("status_priority"),
      dateKey(col("o_orderdate")).as("date_key"),
      col("o_orderdate").cast(DateType).cast(TimestampNTZType).as("order_date"),
      date_trunc("month", col("o_orderdate")).as("order_month_start"),
      date_format(col("o_orderdate"), "yyyy-MM").as("order_ym"),
      months_between(
        date_trunc("month", col("o_orderdate")).cast(DateType),
        lit("1995-01-01").cast(DateType)).cast(IntegerType).as("months_since_1995"),
      datediff(ctx.asOfCol, col("o_orderdate").cast(DateType))
        .cast(IntegerType).as("age_days"),
      d(round(dec2(col("o_totalprice")), 1)).as("price_round1"),
      abs(col("o_totalprice").cast(DoubleType) - lit(150000.0)).as("price_abs_dev"),
      d(dec2(col("o_totalprice")) * lit(2)).as("price_x2"),
      nullif(col("o_orderstatus"), lit("O")).as("status_nullif_open"))
      .orderBy("o_orderkey")
  }

  val all: Seq[QueryDef] = Seq(
    cleanOrders, cleanCustomers, cleanReviews, scalarFunctions(graft.RunContext.default))
}
