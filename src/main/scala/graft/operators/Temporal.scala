package graft.operators

import graft.{QueryDef, core}
import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal join operators (beyond parity; builder brief "custom operators:
  * as-of join, range join"). Spark has no native ASOF or interval join, but
  * both have well-known shuffle-once compositions of built-in operators —
  * preference (a) of the brief's custom-operator ladder — so no custom
  * physical plan is needed:
  *
  *  - as-of join = tagged union + `last(ignoreNulls)` carry-forward window,
  *    partitioned by the join key: ONE hash shuffle of each side, no
  *    row-at-a-time probing, no cross product.
  *  - range join = bucket-expanded equi join: each interval explodes into
  *    the day buckets it covers, the probe side joins on its own bucket
  *    (broadcast hash join — never a nested loop), and a residual predicate
  *    keeps exact interval semantics.
  */
object Temporal {

  /** The tagged click/purchase frames every as-of gate unions — ONE
    * definition of the family invariant (column set, ts-as-t, null casts,
    * side tags), so a schema change to `events` cannot desync the three
    * gates. `clickSide` 0 makes an equal-timestamp click sort before the
    * purchase (at-or-before semantics); 1 makes it sort after
    * (at-or-after). */
  private def taggedClickPurchase(ev: DataFrame, clickSide: Int): (DataFrame, DataFrame) = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("t"), lit(clickSide).as("side"),
        col("ts").as("click_ts"), lit(null).cast(DoubleType).as("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("t"), lit(1 - clickSide).as("side"),
        lit(null).cast(TimestampNTZType).as("click_ts"), col("value"))
    (clicks, purchases)
  }

  /** As-of join: each `purchase` event matched to the user's most recent
    * `click` at-or-before it (the trade⋈quote shape: enrich a fact stream
    * with the latest observation from another stream).
    *
    * Implementation: union both sides tagged (clicks side=0, purchases
    * side=1 — at equal timestamps the click sorts first, giving the `>=`
    * at-or-before semantics DuckDB's `ASOF ... ON p.ts >= c.ts` uses), then
    * `last(click_ts, ignoreNulls)` over a running window partitioned by
    * user. One shuffle by user_id; the window sort is per-user within hash
    * partitions, never global. At 100 TB the only scale hazard is a hot
    * user key — salt by (user, time-chunk) and carry each chunk's last
    * click across the boundary if that arises. Determinism: (user_id, ts)
    * is unique in `events` (checked in DedupSpec-style fixtures), so ties
    * cannot make the match ambiguous on either engine. */
  val jAsofEvent: QueryDef = QueryDef(
    "j_asof_event",
    Some("""
      SELECT p.user_id, p.ts AS purchase_ts, p.value,
             c.ts AS last_click_ts,
             date_diff('microseconds', c.ts, p.ts) AS us_since_click
      FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.user_id, purchase_ts
    """)) { (spark, dir) =>
    val (clicks, purchases) = taggedClickPurchase(events(spark, dir), clickSide = 0)
    val carry = Window.partitionBy("user_id").orderBy("t", "side")
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      .withColumn("last_click_ts", last("click_ts", ignoreNulls = true).over(carry))
      .filter(col("side") === 1)
      .select(col("user_id"), col("t").as("purchase_ts"), col("value"),
        col("last_click_ts"),
        (unix_micros(col("t").cast(TimestampType)) -
          unix_micros(col("last_click_ts").cast(TimestampType))).as("us_since_click"))
      .orderBy("user_id", "purchase_ts")
  }

  /** Range (interval) join: events against ten overlapping 5-day analysis
    * windows spaced 3 days apart — overlap means a bucket trick must be a
    * real interval join, not a disguised group-by.
    *
    * Implementation: the interval side explodes into the day buckets it
    * covers (6 rows per window), the event side computes its own bucket
    * `to_date(ts)`, and a broadcast hash equi-join on the bucket plus a
    * residual `ts ∈ [start, end)` filter gives exact semantics with ZERO
    * nested-loop probing. At 100 TB: events never shuffle (interval side
    * broadcasts), bucket granularity trades fan-out (rows per interval)
    * against residual selectivity — pick it near the median interval
    * length. Empty windows are preserved by a final left join against the
    * window list (10 rows, broadcast). */
  val jRangeWindows: QueryDef = QueryDef(
    "j_range_windows",
    Some("""
      WITH w AS (
        SELECT CAST(i AS INTEGER) AS window_id,
               TIMESTAMP '2024-01-01' + i * INTERVAL 3 DAY AS w_start,
               TIMESTAMP '2024-01-01' + i * INTERVAL 3 DAY + INTERVAL 5 DAY AS w_end
        FROM range(0, 10) t(i))
      SELECT w.window_id,
             count(e.ts) AS n_events,
             CAST(COALESCE(sum(CAST(e.value AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_value
      FROM w LEFT JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
      GROUP BY w.window_id
      ORDER BY w.window_id
    """)) { (spark, dir) =>
    val ev = events(spark, dir).select(col("ts"), col("value"))
    val windows = spark.range(0, 10).select(
      col("id").cast(IntegerType).as("window_id"),
      date_add(to_date(lit("2024-01-01")), (col("id") * 3).cast(IntegerType)).as("sd"))
      .withColumn("ed", date_add(col("sd"), 5))
    val buckets = windows.select(col("window_id"),
      col("sd").cast(TimestampNTZType).as("w_start"),
      col("ed").cast(TimestampNTZType).as("w_end"),
      explode(sequence(col("sd"), col("ed"))).as("bucket"))
    val perWindow = ev.withColumn("bucket", to_date(col("ts")))
      .join(broadcast(buckets), Seq("bucket"))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy("window_id")
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("tv"))
    windows.select("window_id").join(perWindow, Seq("window_id"), "left")
      .select(col("window_id"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        coalesce(col("tv"), lit(0).cast(DecimalType(38, 2))).cast(DoubleType).as("total_value"))
      .orderBy("window_id")
  }

  /** FORWARD as-of join — [[jAsofEvent]]'s time-mirror: each purchase
    * matched to the user's NEXT click at-or-after it (the "time-to-next-
    * action" enrichment attribution and latency analyses need). Same
    * tagged-union shuffle-once shape, with the carry reversed: purchases
    * tag side=0 so an equal-timestamp click (side=1) sorts after and is
    * picked up by `first(ignoreNulls)` over the [current, ∞) frame —
    * giving the `<=` at-or-after semantics DuckDB's forward ASOF uses. */
  val jAsofForward: QueryDef = QueryDef(
    "j_asof_forward",
    Some("""
      SELECT p.user_id, p.ts AS purchase_ts, p.value,
             c.ts AS next_click_ts,
             date_diff('microseconds', p.ts, c.ts) AS us_until_click
      FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts <= c.ts
      ORDER BY p.user_id, purchase_ts
    """)) { (spark, dir) =>
    val (clicks, purchases) = taggedClickPurchase(events(spark, dir), clickSide = 1)
    val carry = Window.partitionBy("user_id").orderBy("t", "side")
      .rowsBetween(0, Window.unboundedFollowing)
    purchases.unionByName(clicks)
      .withColumn("next_click_ts", first("click_ts", ignoreNulls = true).over(carry))
      .filter(col("side") === 0)
      .select(col("user_id"), col("t").as("purchase_ts"), col("value"),
        col("next_click_ts"),
        (unix_micros(col("next_click_ts").cast(TimestampType)) -
          unix_micros(col("t").cast(TimestampType))).as("us_until_click"))
      .orderBy("user_id", "purchase_ts")
  }

  /** NEAREST as-of join — the third member of the as-of family: each
    * purchase matched to the user's temporally CLOSEST click in EITHER
    * direction (pandas `merge_asof(direction='nearest')`; sensor/trade
    * alignment when the enriching stream can lag or lead). Composition,
    * not a new shuffle: ONE tagged union ordered by (t, side) carries
    * BOTH directions over the same window spec — `last(ignoreNulls)` over
    * (-∞, 0] is the at-or-before click ([[jAsofEvent]]'s carry),
    * `first(ignoreNulls)` over [0, +∞) the strictly-after click (an
    * equal-timestamp click sorts before the purchase, so the forward arm
    * is strict — which can never change the nearest answer, since the
    * backward arm already holds that zero-gap click). The two frames
    * share one hash shuffle and one per-user sort; ties in distance break
    * toward the BACKWARD click (deterministic, and the convention that
    * degrades to plain as-of when gaps are equal). The oracle runs
    * DuckDB's native backward and strict-forward ASOF joins and rejoins
    * the two arms on a per-row identity (`rid`) rather than (user_id, ts)
    * — two purchases by one user at the same timestamp would otherwise
    * fan the arm join out 4-ways while the Spark tagged union emits one
    * row per event (the r13 ADVICE latent-fanout finding). */
  val jAsofNearest: QueryDef = QueryDef(
    "j_asof_nearest",
    Some("""
      WITH p AS (SELECT row_number() OVER (ORDER BY user_id, ts, value) AS rid,
                        user_id, ts, value FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
      b AS (
        SELECT p.rid, p.user_id, p.ts, p.value, c.ts AS bts
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts),
      f AS (
        SELECT p.rid, c.ts AS fts
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts < c.ts),
      j AS (
        SELECT b.user_id, b.ts, b.value, b.bts, f.fts,
               date_diff('microseconds', b.bts, b.ts) AS du,
               date_diff('microseconds', b.ts, f.fts) AS dv
        FROM b JOIN f ON b.rid = f.rid)
      SELECT user_id, ts AS purchase_ts, value,
             CASE WHEN bts IS NULL THEN fts WHEN fts IS NULL THEN bts
                  WHEN du <= dv THEN bts ELSE fts END AS nearest_click_ts,
             CAST(CASE WHEN bts IS NULL THEN dv WHEN fts IS NULL THEN du
                  WHEN du <= dv THEN du ELSE dv END AS BIGINT) AS us_gap,
             CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
                  WHEN fts IS NULL OR (bts IS NOT NULL AND du <= dv) THEN 'back'
                  ELSE 'fwd' END AS dir
      FROM j ORDER BY user_id, purchase_ts, value
    """)) { (spark, dir) =>
    val (clicks, purchases) = taggedClickPurchase(events(spark, dir), clickSide = 0)
    val ord = Window.partitionBy("user_id").orderBy("t", "side")
    val back = last("click_ts", ignoreNulls = true)
      .over(ord.rowsBetween(Window.unboundedPreceding, 0))
    val fwd = first("click_ts", ignoreNulls = true)
      .over(ord.rowsBetween(0, Window.unboundedFollowing))
    val du = unix_micros(col("t").cast(TimestampType)) -
      unix_micros(col("bts").cast(TimestampType))
    val dv = unix_micros(col("fts").cast(TimestampType)) -
      unix_micros(col("t").cast(TimestampType))
    clicks.unionByName(purchases)
      .withColumn("bts", back)
      .withColumn("fts", fwd)
      .filter(col("side") === 1)
      .withColumn("du", du)
      .withColumn("dv", dv)
      .select(col("user_id"), col("t").as("purchase_ts"), col("value"),
        when(col("bts").isNull, col("fts"))
          .when(col("fts").isNull, col("bts"))
          .when(col("du") <= col("dv"), col("bts"))
          .otherwise(col("fts")).as("nearest_click_ts"),
        when(col("bts").isNull, col("dv"))
          .when(col("fts").isNull, col("du"))
          .when(col("du") <= col("dv"), col("du"))
          .otherwise(col("dv")).cast(LongType).as("us_gap"),
        when(col("bts").isNull && col("fts").isNull, lit(null).cast(StringType))
          .when(col("fts").isNull || (col("bts").isNotNull && col("du") <= col("dv")),
            lit("back"))
          .otherwise(lit("fwd")).as("dir"))
      .orderBy("user_id", "purchase_ts", "value")
  }

  /** INTERVAL-OVERLAP self join — the interval×interval member of the
    * temporal family ([[jRangeWindows]] is point×interval): find every
    * pair of 7-day order-fulfillment windows of the SAME customer that
    * overlap in time (the double-booking / concurrent-activity question).
    * The scale shape is bucket expansion on BOTH sides: each window covers
    * at most two 7-day week buckets (length == bucket width, the standard
    * granularity choice), the candidate join is equi on (customer, week
    * bucket), the exact `a.s < b.e AND b.s < a.e` predicate filters
    * residually, and a DISTINCT collapses pairs that met in both shared
    * buckets. Candidates are bounded by per-(customer, week) activity —
    * data-bounded fanout, never a customer-wide or global quadratic (a
    * pathological single-key hot spot would surface in `q_heavy_hitters`
    * and take the salting treatment like any skewed equi join). The
    * oracle replays the quadratic per-customer join directly — same
    * pairs, no bucket artifacts. */
  val jIntervalOverlap: QueryDef = QueryDef(
    "j_interval_overlap",
    Some("""
      WITH w AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_orderdate AS DATE) AS s,
               CAST(o_orderdate AS DATE) + 7 AS e
        FROM orders),
      p AS (
        SELECT a.o_custkey, a.o_orderkey AS a_key, b.o_orderkey AS b_key
        FROM w a JOIN w b
          ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        WHERE a.s < b.e AND b.s < a.e)
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_overlaps,
             CAST(min(a_key) AS BIGINT) AS first_a,
             CAST(max(b_key) AS BIGINT) AS last_b
      FROM p GROUP BY o_custkey ORDER BY o_custkey
    """)) { (spark, dir) =>
    val w = tbl(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("s"))
      .withColumn("e", date_add(col("s"), 7))
    // week bucket of a date (anchor arbitrary but shared); a [s, s+7)
    // window touches exactly wk(s) and wk(s+6)
    def wk(c: Column): Column = floor(datediff(c, lit("1970-01-05")) / 7)
    val wb = w.select(col("o_orderkey"), col("o_custkey"), col("s"), col("e"),
      explode(sequence(wk(col("s")), wk(date_add(col("s"), 6)))).as("wkb"))
    wb.as("a")
      .join(wb.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("a.wkb") === col("b.wkb") &&
          col("a.o_orderkey") < col("b.o_orderkey"))
      .filter(col("a.s") < col("b.e") && col("b.s") < col("a.e"))
      .select(col("a.o_custkey").as("o_custkey"),
        col("a.o_orderkey").as("a_key"), col("b.o_orderkey").as("b_key"))
      .distinct() // a pair can meet in both of its shared week buckets
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_overlaps"),
        min(col("a_key")).as("first_a"),
        max(col("b_key")).as("last_b"))
      .orderBy("o_custkey")
  }

  val all: Seq[QueryDef] = Seq(jAsofEvent, jRangeWindows, jAsofForward,
    jAsofNearest, jIntervalOverlap)
}
