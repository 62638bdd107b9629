package graft.analytics

import graft.{QueryDef, core}
import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's five analytics queries (reference
  * `warehouse/analytics_queries.sql:15–246`), re-instantiated over the
  * driver's TPC-H-ish star schema: `orders`+`lineitem` as facts,
  * `customer` / `part` as dimensions (FIXTURES.md §D).
  *
  * Every money aggregate goes through exact DecimalType and every ratio
  * through IEEE double-on-exact-inputs so results hash-match DuckDB at any
  * parallelism — see [[graft.core]]. Scale posture: the grouped CTEs are
  * partial-aggregated map-side by Spark automatically; the unpartitioned
  * ORDER BY windows (W1/W2) act on *already aggregated* month-grain rows
  * (dozens–hundreds of rows at any data scale), so the single-partition
  * window is not a bottleneck even at 100 TB of fact data.
  */
object Analytics {

  /** Q1 — monthly revenue + MoM % + running total
    * (reference `analytics_queries.sql:15–45`: A3 + W1 LAG + W2 running SUM). */
  val q1MonthlyRevenue: QueryDef = QueryDef(
    "q1_monthly_revenue",
    Some("""
      WITH monthly AS (
        SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS revenue,
               count(*) AS n_orders
        FROM orders
        GROUP BY 1, 2)
      SELECT o_year, o_month, CAST(revenue AS DOUBLE) AS revenue, n_orders,
             CAST(lag(revenue) OVER (ORDER BY o_year, o_month) AS DOUBLE) AS prev_revenue,
             CAST(sum(revenue) OVER (ORDER BY o_year, o_month
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue,
             (CAST(revenue AS DOUBLE) - CAST(lag(revenue) OVER (ORDER BY o_year, o_month) AS DOUBLE))
               / CAST(lag(revenue) OVER (ORDER BY o_year, o_month) AS DOUBLE) * 100.0 AS mom_pct
      FROM monthly
      ORDER BY o_year, o_month
    """)) { (spark, dir) =>
    val orders = tbl(spark, dir, "orders")
    // revenue stays exact decimal through the windows; DOUBLE only at output
    val monthly = orders
      .groupBy(year(col("o_orderdate")).as("o_year"), month(col("o_orderdate")).as("o_month"))
      .agg(moneySum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    val w = Window.orderBy("o_year", "o_month")
    val prev = lag(col("revenue"), 1).over(w)
    monthly
      .withColumn("prev_revenue", d(prev))
      .withColumn("running_revenue",
        d(sum(col("revenue")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("mom_pct",
        (col("revenue").cast(DoubleType) - prev.cast(DoubleType)) / prev.cast(DoubleType) * lit(100.0))
      .withColumn("revenue", d(col("revenue")))
      .orderBy("o_year", "o_month")
  }

  /** Q2 — customer segmentation: NTILE quartiles within market segment +
    * deviation from segment average
    * (reference `analytics_queries.sql:54–85`: A4 + W3 NTILE + W4 partition AVG). */
  val q2CustomerSegmentation: QueryDef = QueryDef(
    "q2_customer_segmentation",
    Some("""
      WITH spend AS (
        SELECT c_custkey, c_name, c_mktsegment,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_spend,
               count(*) AS n_orders
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY 1, 2, 3)
      SELECT c_custkey, c_name, c_mktsegment, CAST(total_spend AS DOUBLE) AS total_spend, n_orders,
             ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY total_spend DESC, c_custkey) AS spend_quartile,
             CAST(sum(total_spend) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
               / CAST(count(*) OVER (PARTITION BY c_mktsegment) AS DOUBLE) AS avg_segment_spend,
             CAST(total_spend AS DOUBLE)
               - CAST(sum(total_spend) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
                 / CAST(count(*) OVER (PARTITION BY c_mktsegment) AS DOUBLE) AS spend_vs_avg
      FROM spend
      ORDER BY c_mktsegment, total_spend DESC, c_custkey
    """)) { (spark, dir) =>
    val customer = tbl(spark, dir, "customer")
    val orders = tbl(spark, dir, "orders")
    // customer is the dimension side (20K rows vs 100K+ orders, and the gap
    // widens with scale) — broadcast it so the fact table never shuffles.
    val spend = orders
      .join(broadcast(customer), customer("c_custkey") === orders("o_custkey"))
      .groupBy("c_custkey", "c_name", "c_mktsegment")
      .agg(moneySum(col("o_totalprice")).as("total_spend"), count(lit(1)).as("n_orders"))
    val seg = Window.partitionBy("c_mktsegment")
    val avgSeg = sum(col("total_spend")).over(seg).cast(DoubleType) /
      count(lit(1)).over(seg).cast(DoubleType)
    spend
      .withColumn("spend_quartile",
        ntile(4).over(seg.orderBy(col("total_spend").desc, col("c_custkey"))))
      .withColumn("avg_segment_spend", avgSeg)
      .withColumn("spend_vs_avg", col("total_spend").cast(DoubleType) - avgSeg)
      .withColumn("total_spend", d(col("total_spend")))
      .orderBy(col("c_mktsegment"), col("total_spend").desc, col("c_custkey"))
  }

  /** Q3 — product revenue rank within type + % of type revenue
    * (reference `analytics_queries.sql:94–126`: A5 + W5 RANK + W6 pct-of-total). */
  val q3ProductRank: QueryDef = QueryDef(
    "q3_product_rank",
    Some("""
      WITH perf AS (
        SELECT p_type, p_brand,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS product_revenue,
               count(*) AS n_items
        FROM part JOIN lineitem ON p_partkey = l_partkey
        GROUP BY 1, 2)
      SELECT p_type, p_brand, CAST(product_revenue AS DOUBLE) AS product_revenue, n_items,
             rank() OVER (PARTITION BY p_type ORDER BY product_revenue DESC) AS revenue_rank,
             CAST(sum(product_revenue) OVER (PARTITION BY p_type) AS DOUBLE) AS type_revenue,
             CAST(product_revenue AS DOUBLE)
               / CAST(sum(product_revenue) OVER (PARTITION BY p_type) AS DOUBLE) * 100.0 AS pct_of_type
      FROM perf
      ORDER BY p_type, revenue_rank, p_brand
    """)) { (spark, dir) =>
    val part = tbl(spark, dir, "part")
    val lineitem = tbl(spark, dir, "lineitem")
    // dims ≪ facts: broadcast the dimension side so the fact table never shuffles
    val perf = lineitem
      .join(broadcast(part), part("p_partkey") === lineitem("l_partkey"))
      .groupBy("p_type", "p_brand")
      .agg(moneySum(col("l_extendedprice")).as("product_revenue"), count(lit(1)).as("n_items"))
    val typeW = Window.partitionBy("p_type")
    val typeRev = sum(col("product_revenue")).over(typeW)
    perf
      .withColumn("revenue_rank", rank().over(typeW.orderBy(col("product_revenue").desc)))
      .withColumn("type_revenue", d(typeRev))
      .withColumn("pct_of_type",
        col("product_revenue").cast(DoubleType) / typeRev.cast(DoubleType) * lit(100.0))
      .withColumn("product_revenue", d(col("product_revenue")))
      .orderBy(col("p_type"), col("revenue_rank"), col("p_brand"))
  }

  /** Q4 — cohort retention: first-order month cohorts × activity month
    * (reference `analytics_queries.sql:135–184`: A6–A8 + J8/J9 + F13/F14).
    * The reference's correlated scalar subquery is decorrelated into plain
    * aggregate-joins (SURVEY.md §2.5 J8); Catalyst would do the same. */
  val q4CohortRetention: QueryDef = QueryDef(
    "q4_cohort_retention",
    Some("""
      WITH cohort AS (
        SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cohort_month
        FROM orders GROUP BY 1),
      activity AS (
        SELECT c.cohort_month, date_trunc('month', o.o_orderdate) AS activity_month,
               count(DISTINCT o.o_custkey) AS active_customers
        FROM orders o JOIN cohort c ON o.o_custkey = c.o_custkey
        GROUP BY 1, 2),
      sizes AS (
        SELECT cohort_month, count(*) AS cohort_size FROM cohort GROUP BY 1)
      SELECT a.cohort_month, a.activity_month,
             CAST(date_diff('month', a.cohort_month, a.activity_month) AS INTEGER) AS months_since_first,
             a.active_customers, s.cohort_size,
             CAST(a.active_customers AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) * 100.0 AS retention_pct
      FROM activity a JOIN sizes s ON a.cohort_month = s.cohort_month
      WHERE CAST(date_diff('month', a.cohort_month, a.activity_month) AS INTEGER) BETWEEN 0 AND 12
      ORDER BY a.cohort_month, a.activity_month
    """)) { (spark, dir) =>
    val orders = tbl(spark, dir, "orders")
    val cohort = orders
      .groupBy(col("o_custkey"))
      .agg(min(date_trunc("month", col("o_orderdate"))).as("cohort_month"))
    val activity = orders
      .join(cohort, "o_custkey")
      .groupBy(col("cohort_month"), date_trunc("month", col("o_orderdate")).as("activity_month"))
      .agg(countDistinct(col("o_custkey")).as("active_customers"))
    val sizes = cohort.groupBy("cohort_month").agg(count(lit(1)).as("cohort_size"))
    val monthsSince =
      months_between(col("activity_month").cast(DateType), col("cohort_month").cast(DateType))
        .cast(IntegerType)
    activity
      .join(sizes, "cohort_month")
      .withColumn("months_since_first", monthsSince)
      .filter(col("months_since_first").between(0, 12))
      .withColumn("retention_pct",
        col("active_customers").cast(DoubleType) / col("cohort_size").cast(DoubleType) * lit(100.0))
      .select("cohort_month", "activity_month", "months_since_first",
        "active_customers", "cohort_size", "retention_pct")
      .orderBy("cohort_month", "activity_month")
  }

  /** Q5 — daily revenue anomaly detection over a trailing 7-row frame that
    * excludes the current row (reference `analytics_queries.sql:194–246`:
    * A9 + W7 + P6 + P9). The windowed Σx is exact BIGINT *cents*; Σx² is
    * accumulated in DECIMAL(38,0) because cents² overflows Long once daily
    * revenue passes ~$11.5M — sf0.1 already trips ANSI overflow, and at
    * 100 TB (c ≈ 1e13 cents/day) Σx² ≈ 7e26 still fits DECIMAL(38,0) with
    * 11 digits to spare. Both accumulations are associative/exact, so the
    * single conversion to DOUBLE yields identical bits on both engines
    * (int64→double is correctly rounded; decimal→double is correctly
    * rounded while the value < 2^63, which holds at every driver-gated
    * scale factor); all subsequent stddev math is then identical IEEE ops
    * on identical doubles. */
  val q5DailyAnomaly: QueryDef = QueryDef(
    "q5_daily_anomaly",
    Some("""
      WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS ship_date,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS daily_revenue,
               count(*) AS n_items
        FROM lineitem
        GROUP BY 1),
      cents AS (
        SELECT ship_date, daily_revenue, n_items,
               CAST(daily_revenue * 100 AS BIGINT) AS c
        FROM daily),
      framed AS (
        SELECT ship_date, daily_revenue, n_items,
               CAST(c AS DOUBLE) AS cd,
               CAST(CAST(sum(c) OVER w AS BIGINT) AS DOUBLE) AS s7,
               CAST(CAST(sum(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) OVER w
                    AS DECIMAL(38,0)) AS DOUBLE) AS q7,
               CAST(count(*) OVER w AS DOUBLE) AS n7
        FROM cents
        WINDOW w AS (ORDER BY ship_date ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      SELECT CAST(ship_date AS TIMESTAMP) AS ship_date,
             CAST(daily_revenue AS DOUBLE) AS daily_revenue, n_items,
             s7 / n7 / 100.0 AS moving_avg_7d,
             sqrt(CASE WHEN (q7 - s7 * s7 / n7) / (n7 - 1.0) < 0.0 THEN 0.0
                       ELSE (q7 - s7 * s7 / n7) / (n7 - 1.0) END) / 100.0 AS moving_std_7d,
             CASE WHEN abs(cd - s7 / n7)
                       > 2.0 * sqrt(CASE WHEN (q7 - s7 * s7 / n7) / (n7 - 1.0) < 0.0 THEN 0.0
                                         ELSE (q7 - s7 * s7 / n7) / (n7 - 1.0) END)
                  THEN 'ANOMALY' ELSE 'NORMAL' END AS day_flag
      FROM framed
      WHERE n7 >= 2.0
      ORDER BY ship_date
    """)) { (spark, dir) =>
    val lineitem = tbl(spark, dir, "lineitem")
    val daily = lineitem
      .groupBy(col("l_shipdate").cast(DateType).as("ship_date"))
      .agg(
        sum(dec2(col("l_extendedprice"))).cast(DecimalType(18, 2)).as("daily_revenue"),
        count(lit(1)).as("n_items"))
      .withColumn("c", (col("daily_revenue") * 100).cast(LongType))
    val w = Window.orderBy("ship_date").rowsBetween(-7, -1)
    val framed = daily
      .withColumn("cd", col("c").cast(DoubleType))
      .withColumn("s7", sum(col("c")).over(w).cast(DoubleType))
      .withColumn("q7",
        sum(col("c").cast(DecimalType(19, 0)) * col("c").cast(DecimalType(19, 0)))
          .over(w).cast(DecimalType(38, 0)).cast(DoubleType))
      .withColumn("n7", count(lit(1)).over(w).cast(DoubleType))
    val variance = (col("q7") - col("s7") * col("s7") / col("n7")) / (col("n7") - lit(1.0))
    val std = sqrt(when(variance < lit(0.0), lit(0.0)).otherwise(variance))
    val ma = col("s7") / col("n7")
    framed
      .withColumn("moving_avg_7d", ma / lit(100.0))
      .withColumn("moving_std_7d", std / lit(100.0))
      .withColumn("day_flag",
        when(abs(col("cd") - ma) > lit(2.0) * std, "ANOMALY").otherwise("NORMAL"))
      .filter(col("n7") >= lit(2.0))
      .select(col("ship_date").cast(TimestampNTZType).as("ship_date"),
        d(col("daily_revenue")).as("daily_revenue"), col("n_items"),
        col("moving_avg_7d"), col("moving_std_7d"), col("day_flag"))
      .orderBy("ship_date")
  }

  /** TOP-K PER GROUP — the "3 best products per brand" query, written as
    * a ranked window + `rn <= k` filter so Spark's rank-limit pushdown
    * (`WindowGroupLimit`, asserted in PlanSpec) keeps only k rows per
    * group ALIVE THROUGH THE SORT on each map side: at 100 TB the window
    * never materializes a full per-brand ordering, it streams each
    * partition keeping a k-row heap. row_number over (revenue DESC,
    * p_partkey) — not rank — pins ties deterministically. */
  val wTopkPerGroup: QueryDef = QueryDef(
    "w_topk_per_group",
    Some("""
      WITH rev AS (
        SELECT p_brand, p_partkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2),
      ranked AS (
        SELECT p_brand, p_partkey, revenue,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY revenue DESC, p_partkey) AS rn
        FROM rev)
      SELECT p_brand, p_partkey, revenue, rn
      FROM ranked WHERE rn <= 3
      ORDER BY p_brand, rn
    """)) { (spark, dir) =>
    val rev = tbl(spark, dir, "lineitem")
      .join(broadcast(tbl(spark, dir, "part").select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(moneySumD(col("l_extendedprice")).as("revenue"))
    val byBrand = Window.partitionBy("p_brand")
      .orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rn", row_number().over(byBrand))
      .filter(col("rn") <= 3)
      .orderBy("p_brand", "rn")
  }

  /** WINDOW GALLERY — the analytic-function builtins the five reference
    * queries don't reach (`percent_rank`, `cume_dist`, `first/last/
    * nth_value`, offset defaults), exercised over one per-customer order
    * sequence so the whole gallery shares a single shuffle + sort. The
    * full-partition functions pin their frame to ROWS UNBOUNDED
    * PRECEDING..UNBOUNDED FOLLOWING explicitly — both engines default
    * `last_value` to ...CURRENT ROW, the classic silent-wrong-answer
    * frame. Ordering is (o_orderdate, o_orderkey): unique, so every rank
    * and offset is deterministic. */
  val wWindowGallery: QueryDef = QueryDef(
    "w_window_gallery",
    Some("""
      SELECT o_custkey, o_orderkey,
             row_number() OVER w AS seq,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd,
             first_value(o_totalprice) OVER wf AS first_total,
             last_value(o_totalprice) OVER wf AS last_total,
             nth_value(o_totalprice, 2) OVER wf AS second_total,
             lag(o_totalprice, 1, -1.0) OVER w AS prev_total,
             lead(o_totalprice, 1, -1.0) OVER w AS next_total
      FROM orders
      WINDOW
        w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, seq
    """)) { (spark, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tbl(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("seq"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        first(col("o_totalprice")).over(wf).as("first_total"),
        last(col("o_totalprice")).over(wf).as("last_total"),
        nth_value(col("o_totalprice"), 2).over(wf).as("second_total"),
        lag(col("o_totalprice"), 1, -1.0).over(w).as("prev_total"),
        lead(col("o_totalprice"), 1, -1.0).over(w).as("next_total"))
      .orderBy("o_custkey", "seq")
  }

  /** MARKET-BASKET AFFINITY (beyond parity) — co-occurrence counts of part
    * pairs within an order, the association-mining primitive behind
    * "frequently bought together". The pair generator is a SELF-JOIN ON THE
    * BASKET KEY with an ordered-pair predicate (p1 < p2), so fanout per
    * order is C(lines, 2) with lines bounded by the basket size — candidate
    * volume stays linear in the fact with a small constant, never all-pairs
    * across baskets (the same bounded-blocking discipline as
    * [[graft.operators.Linkage.dFuzzyMatch]]). Counts partial-aggregate
    * map-side after the join; the head is taken with fully pinned
    * tie-breaks. Deduplicated per (order, pair) first: a part appearing on
    * two lines of one order would otherwise double-count the pair. */
  val aBasketPairs: QueryDef = QueryDef(
    "a_basket_pairs",
    Some("""
      WITH lines AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      pairs AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2
        FROM lines a JOIN lines b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
      SELECT p1, p2, CAST(count(*) AS BIGINT) AS n_baskets
      FROM pairs GROUP BY p1, p2
      ORDER BY n_baskets DESC, p1, p2 LIMIT 20
    """)) { (spark, dir) =>
    val lines = tbl(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    lines.as("a").join(lines.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
      .agg(count(lit(1)).as("n_baskets"))
      .orderBy(col("n_baskets").desc, col("p1"), col("p2"))
      .limit(20)
  }

  val all: Seq[QueryDef] = Seq(
    q1MonthlyRevenue, q2CustomerSegmentation, q3ProductRank,
    q4CohortRetention, q5DailyAnomaly, wTopkPerGroup, wWindowGallery,
    aBasketPairs)
}
