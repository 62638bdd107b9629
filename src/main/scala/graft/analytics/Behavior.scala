package graft.analytics

import graft.{QueryDef, core}
import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** User-behavior analytics over the event stream: gap-based sessionization
  * and ordered funnel analysis. The reference's analytics layer stops at
  * windowed rollups (`analytics_queries.sql`); these complete the family
  * with the two event-sequence operators every product-analytics warehouse
  * ships.
  *
  * Time arithmetic is done on INTEGER microseconds (the parquet column's
  * raw nanos `div 1000`), never on floats or seconds-truncated casts, so
  * gap comparisons are bit-deterministic and identical to the DuckDB
  * oracle's `epoch_us(ts)`.
  */
object Behavior {

  private val GapUs = 1800L * 1000000L // 30-minute inactivity gap, in µs

  /** The sessionizer core over `(user_id, us: Long, value)` — per-session
    * `(user_id, session_id, start_us, end_us, n_events, total_value)`.
    * Exposed so the property suite can drive generated event sets through
    * the REAL window expressions against a single-node reference. */
  def sessionize(ev: DataFrame, gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us")
    ev.withColumn("boundary",
        when(lag("us", 1).over(byUser).isNull ||
          col("us") - lag("us", 1).over(byUser) > gapUs, 1).otherwise(0))
      .withColumn("session_id",
        sum("boundary").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        min("us").as("start_us"),
        max("us").as("end_us"),
        count(lit(1)).as("n_events"),
        moneySumD(col("value")).as("total_value"))
  }

  /** Gap-based SESSIONIZATION (batch twin of the streaming
    * `st_session_windows` gate): a new session starts when a user is idle
    * longer than the gap. Classic lag-then-cumulative-sum: `boundary =
    * (us - lag(us) > gap)`, `session_id = running sum of boundaries` —
    * both windows share one (user_id, us) sort, so Spark plans a SINGLE
    * shuffle + sort for the whole query, and the final per-session
    * aggregate reuses the user_id hash partitioning (its grouping key is a
    * superset, so no second exchange). Sessions-per-user is bounded by the
    * user's own event count — nothing here depends on corpus size, which
    * is what lets the same plan run at 100 TB. */
  val aSessionizeGaps: QueryDef = QueryDef(
    "a_sessionize_gaps",
    Some("""
      WITH seq AS (
        SELECT user_id, epoch_us(ts) AS us, value,
               CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                         > 1800000000
                    THEN 1 ELSE 0 END AS boundary
        FROM events),
      sess AS (
        SELECT user_id, us, value,
               sum(boundary) OVER (PARTITION BY user_id ORDER BY us
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM seq)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             make_timestamp(min(us)) AS session_start,
             make_timestamp(max(us)) AS session_end,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             CAST(max(us) - min(us) AS DOUBLE) / 1000000.0 AS duration_sec
      FROM sess
      GROUP BY 1, 2
      ORDER BY user_id, session_id
    """)) { (spark, dir) =>
    sessionize(
      core.eventsUs(spark, dir).select(col("user_id"), col("us"), col("value")),
      GapUs)
      .select(col("user_id"), col("session_id"),
        expr("timestamp_micros(start_us)").cast(TimestampNTZType).as("session_start"),
        expr("timestamp_micros(end_us)").cast(TimestampNTZType).as("session_end"),
        col("n_events"), col("total_value"),
        ((col("end_us") - col("start_us")).cast(DoubleType) / 1000000.0).as("duration_sec"))
      .orderBy("user_id", "session_id")
  }

  /** Ordered FUNNEL: signup → first view AFTER the signup → first purchase
    * AFTER that view, per user; output is the one-row step-count /
    * conversion summary. Each step is a per-user conditional `min(ts)`
    * joined back to the event stream — every join and aggregate clusters
    * on user_id, so Spark shuffles the events once and reuses the
    * partitioning across all three stages; step tables shrink to one row
    * per surviving user. The strict `ts >` ordering (not co-occurrence)
    * is what makes this a funnel rather than a set-intersection. */
  val aFunnelSteps: QueryDef = QueryDef(
    "a_funnel_steps",
    Some("""
      WITH s AS (
        SELECT user_id, min(ts) AS st FROM events
        WHERE event_type = 'signup' GROUP BY 1),
      v AS (
        SELECT e.user_id, min(e.ts) AS vt
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'view' AND e.ts > s.st GROUP BY 1),
      p AS (
        SELECT e.user_id, min(e.ts) AS pt
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND e.ts > v.vt GROUP BY 1)
      SELECT (SELECT count(*) FROM s) AS n_signup,
             (SELECT count(*) FROM v) AS n_then_view,
             (SELECT count(*) FROM p) AS n_then_purchase,
             CAST((SELECT count(*) FROM v) AS DOUBLE)
               / CAST((SELECT count(*) FROM s) AS DOUBLE) AS view_rate,
             CAST((SELECT count(*) FROM p) AS DOUBLE)
               / CAST((SELECT count(*) FROM v) AS DOUBLE) AS purchase_rate
    """)) { (spark, dir) =>
    val ev = core.events(spark, dir).select(col("user_id"), col("ts"), col("event_type"))
    val s = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("st"))
    val v = ev.filter(col("event_type") === "view")
      .join(s, "user_id").filter(col("ts") > col("st"))
      .groupBy("user_id").agg(min("ts").as("vt"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(v, "user_id").filter(col("ts") > col("vt"))
      .groupBy("user_id").agg(min("ts").as("pt"))
    val ns = s.agg(count(lit(1)).as("n_signup"))
    val nv = v.agg(count(lit(1)).as("n_then_view"))
    val np = p.agg(count(lit(1)).as("n_then_purchase"))
    ns.crossJoin(broadcast(nv)).crossJoin(broadcast(np))
      .select(col("n_signup"), col("n_then_view"), col("n_then_purchase"),
        (col("n_then_view").cast(DoubleType) / col("n_signup").cast(DoubleType))
          .as("view_rate"),
        (col("n_then_purchase").cast(DoubleType) / col("n_then_view").cast(DoubleType))
          .as("purchase_rate"))
  }

  val all: Seq[QueryDef] = Seq(aSessionizeGaps, aFunnelSteps)
}
