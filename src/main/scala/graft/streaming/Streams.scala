package graft.streaming

import graft.{QueryDef, core}
import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table (SURVEY.md §2.10
  * extension; the reference is batch-only, so these are the beyond-parity
  * stream ops the brief asks for). The file source + `Trigger.AvailableNow`
  * processes the full table as a bounded stream — the same code would run
  * unbounded against a landing directory; at scale the stateful aggregation
  * shuffles only (window, key) partials, bounded by the watermark. */
object Streams {

  /** Run `start` with the session's shuffle-partition count narrowed to
    * `n` for the duration of query PLANNING — streaming state partitioning
    * is captured at first start and each state partition pays a per-batch
    * store commit, so the count should size to state volume (a per-query,
    * data-dependent choice), not to the session's scan parallelism. The
    * session conf is restored immediately; the running query keeps the
    * captured value. */
  private def withStatePartitions[A](spark: SparkSession, n: Int)(start: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try start finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Stage the events table (ts as µs TIMESTAMP — watermarks require
    * TIMESTAMP, not NTZ) into a persistent landing directory, writing it
    * only if absent. A real streaming deployment reads a durable landing
    * zone; re-staging identical immutable input on every run was pure
    * harness overhead. The landing path is keyed by a signature of the
    * source files (names + sizes) plus a staging-semantics version, so a
    * regenerated source or a changed staging transform can never serve a
    * stale landing. */
  private def eventsLanding(spark: SparkSession, dir: String): String = {
    val sig = sourceSig(spark, dir, "events")
    val landing = scratch(dir, s"events_ts_landing_v1_$sig")
    val marker = new org.apache.hadoop.fs.Path(landing, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker))
      events(spark, dir)
        .withColumn("ts", col("ts").cast(TimestampType))
        .write.mode("overwrite").parquet(landing)
    landing
  }

  /** Watermark delay that provably covers the whole event-time span of a
    * bounded landing. The `AvailableNow` replay reads files in arbitrary
    * order, so result-vs-batch-oracle equality needs NO row to fall behind
    * the watermark — and a hard-coded delay holds only while the fixture
    * spans less than it (a regenerated events table spanning > 35 days
    * would have silently diverged from the DISTINCT oracle). One
    * column-pruned min/max batch pre-pass per query — counter-scale
    * output; a live unbounded deployment replaces this with a small
    * constant delay and aggressive state eviction. */
  private def spanCoveringDelay(spark: SparkSession, landing: String, tsCol: String = "ts"): String = {
    val span = spark.read.parquet(landing)
      .agg(datediff(max(col(tsCol)), min(col(tsCol)))).head().getInt(0)
    // +2 days: datediff truncates both endpoints to whole dates and the
    // delay must strictly exceed the true span
    s"${span + 2} days"
  }

  /** st1 — event-time tumbling-window aggregation as a real streaming job:
    * `readStream` file source → 1-hour `window(ts)` groupBy with a
    * watermark → memory sink via `Trigger.AvailableNow`. The single
    * bounded run is deterministic, so the batch oracle (date_trunc) matches
    * exactly. */
  val stHourlyWindows: QueryDef = QueryDef(
    "st_hourly_windows",
    Some("""
      SELECT date_trunc('hour', ts) AS window_start,
             event_type,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start, event_type
    """)) { (spark, dir) =>
    // The file stream source needs a landing *directory* (session TZ is
    // pinned UTC so wall-clock semantics are identical and the output is
    // cast back to NTZ at the end).
    val landing = eventsLanding(spark, dir)
    val schema = spark.read.parquet(landing).schema
    val sinkName = "graft_st_hourly_" + dirTag(dir)
    val q = withStatePartitions(spark, 8) {
      spark.readStream.schema(schema).parquet(landing)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          moneySumD(col("value")).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("total_value"))
        .writeStream
        .format("memory")
        .queryName(sinkName)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    spark.table(sinkName)
      .withColumn("window_start", col("window_start").cast(TimestampNTZType))
      .orderBy("window_start", "event_type")
  }

  /** st2 — session windows: gap-based (30 min) per-user sessions via the
    * native `session_window` operator. The oracle derives identical
    * sessions with the classic gaps-and-islands window SQL (new-session
    * flag → running sum → group), proving the semantics line up. */
  val stSessionWindows: QueryDef = QueryDef(
    "st_session_windows",
    Some("""
      WITH flagged AS (
        SELECT user_id, ts,
               -- >= (not >): session_window merges only on strict overlap of
               -- [ts, ts+gap), so an event landing exactly gap after its
               -- predecessor starts a NEW session on both engines
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged)
      SELECT user_id,
             min(ts) AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end,
             count(*) AS n_events
      FROM sess
      GROUP BY user_id, sess_id
      ORDER BY user_id, session_start
    """)) { (spark, dir) =>
    events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** st3 — semi-structured event payloads: `from_json` over the `props`
    * JSON column (the Kafka-style pattern: opaque string payload → typed
    * struct), aggregated per event type. */
  val stJsonProps: QueryDef = QueryDef(
    "st_json_props",
    Some("""
      SELECT event_type,
             count(*) AS n_events,
             CAST(sum(CAST(regexp_extract(props, '[0-9]+') AS INTEGER)) AS BIGINT) AS k_sum,
             min(CAST(regexp_extract(props, '[0-9]+') AS INTEGER)) AS k_min,
             max(CAST(regexp_extract(props, '[0-9]+') AS INTEGER)) AS k_max
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """)) { (spark, dir) =>
    val k = from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))("k")
    events(spark, dir)
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).cast(LongType).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .orderBy("event_type")
  }

  // Typed records for st4 (public: Spark's codegen'd encoders must reach
  // them). Timestamps travel as epoch micros and money as exact integer
  // cents — primitive, associative, engine-parity-safe.
  case class EvIn(user_id: Long, us: Long, cents: Long)
  case class UserSt(n: Long, first_us: Long, last_us: Long, cents: Long)
  case class UserOut(user_id: Long, n_events: Long, first_us: Long, last_us: Long, cents: Long)

  /** st4 — CUSTOM-STATE streaming: per-user lifetime aggregates kept in a
    * `GroupState` via `KeyValueGroupedDataset.mapGroupsWithState` — the
    * stateful-API surface the built-in windowed aggregations can't express
    * (arbitrary per-key state machines). `groupByKey` hash-shuffles events
    * to their state partition once; the state store then holds one small
    * record per user — at 100 TB of events the state is bounded by
    * |users|, not |events|. The bounded `AvailableNow` run drains the
    * table deterministically, so a plain GROUP BY is an exact oracle. */
  val stStatefulUserAgg: QueryDef = QueryDef(
    "st_stateful_user_agg",
    Some("""
      SELECT user_id,
             count(*) AS n_events,
             min(ts) AS first_ts,
             max(ts) AS last_ts,
             CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
      FROM events
      GROUP BY user_id
      ORDER BY user_id
    """)) { (spark, dir) =>
    import spark.implicits._
    val landing = eventsLanding(spark, dir)
    val schema = spark.read.parquet(landing).schema
    val sinkName = "graft_st_state_" + dirTag(dir)
    val q = withStatePartitions(spark, 8) {
      spark.readStream.schema(schema).parquet(landing)
        .select(col("user_id"),
          unix_micros(col("ts")).as("us"),
          (dec2(col("value")) * 100).cast(LongType).as("cents"))
        .as[EvIn]
        .groupByKey(_.user_id)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
          (uid: Long, evs: Iterator[EvIn], st: GroupState[UserSt]) =>
            val prev = st.getOption.getOrElse(UserSt(0L, Long.MaxValue, Long.MinValue, 0L))
            val next = evs.foldLeft(prev) { (s, e) =>
              UserSt(s.n + 1, math.min(s.first_us, e.us), math.max(s.last_us, e.us),
                s.cents + e.cents)
            }
            st.update(next)
            UserOut(uid, next.n, next.first_us, next.last_us, next.cents)
        }
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    // AvailableNow may chunk the source into several micro-batches; the
    // update-mode memory sink then holds one row per (user, batch) — keep
    // each user's FINAL state (n_events is strictly increasing).
    val latest = Window.partitionBy("user_id").orderBy(col("n_events").desc)
    spark.table(sinkName)
      .withColumn("__rn", row_number().over(latest)).filter(col("__rn") === 1)
      .select(col("user_id"), col("n_events"),
        timestamp_micros(col("first_us")).cast(TimestampNTZType).as("first_ts"),
        timestamp_micros(col("last_us")).cast(TimestampNTZType).as("last_ts"),
        col("cents").as("total_value_cents"))
      .orderBy("user_id")
  }

  /** st5 — STREAM-STREAM interval join: the purchases stream inner-joined
    * to the clicks stream on user within a 24-hour look-back — the
    * attribution-join shape (`purchase ⋈ clicks in [t−24h, t]`). Both sides
    * carry watermarks and the join predicate bounds event-time distance, so
    * the state store provably retains only a sliding day per side at any
    * scale. The watermark DELAY is derived from the fixture's actual
    * event-time span (spanCoveringDelay): the bounded `AvailableNow`
    * replay reads files in arbitrary order, and a tighter delay would make
    * results depend on which micro-batch a file lands in (dropped "late"
    * rows) — in a live deployment with near-ordered arrival the same query
    * runs with a minutes-long delay and aggressive state eviction. The
    * oracle is the equivalent batch interval join. */
  val stStreamStreamJoin: QueryDef = QueryDef(
    "st_stream_stream_join",
    Some("""
      SELECT p.user_id, p.ts AS purchase_ts, c.ts AS click_ts
      FROM events p JOIN events c ON p.user_id = c.user_id
       AND p.event_type = 'purchase' AND c.event_type = 'click'
       AND c.ts BETWEEN p.ts - INTERVAL 24 HOURS AND p.ts
      ORDER BY 1, 2, 3
    """)) { (spark, dir) =>
    val landing = eventsLanding(spark, dir)
    val schema = spark.read.parquet(landing).schema
    val sinkName = "graft_st_ssjoin_" + dirTag(dir)
    val delay = spanCoveringDelay(spark, landing)
    def src = spark.readStream.schema(schema).parquet(landing)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    // a stream-stream join keeps 4 state stores per partition, each paying
    // a per-batch commit — size the count to this fixture's state volume
    val q = withStatePartitions(spark, 8) {
      purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 24 HOURS") &&
          col("click_ts") <= col("purchase_ts"))
        .select(col("user_id"), col("purchase_ts"), col("click_ts"))
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    spark.table(sinkName)
      .withColumn("purchase_ts", col("purchase_ts").cast(TimestampNTZType))
      .withColumn("click_ts", col("click_ts").cast(TimestampNTZType))
      .orderBy("user_id", "purchase_ts", "click_ts")
  }

  /** st6 — `foreachBatch` warehouse sink: the standard streaming→warehouse
    * bridge. Each micro-batch MERGES into a persistent user dimension
    * (latest event per user), using a batch-ORDER-INSENSITIVE rule — keep
    * the max-`ts` row per key across (existing ∪ batch) — so the final
    * table is identical no matter how `AvailableNow` chunks the replay or
    * which order files arrive in. (A "last batch wins" merge would NOT be:
    * the file source makes no cross-batch time-order promise.) At scale
    * each merge shuffles only |batch| + |dim| rows on the key; the oracle
    * is the batch `arg_max` equivalent. */
  val stForeachBatchUpsert: QueryDef = QueryDef(
    "st_foreach_batch_upsert",
    Some("""
      SELECT user_id,
             arg_max(event_type, ts) AS last_event_type,
             max(ts) AS last_ts
      FROM events
      GROUP BY user_id
      ORDER BY user_id
    """)) { (spark, dir) =>
    val landing = eventsLanding(spark, dir)
    val schema = spark.read.parquet(landing).schema
    val dimDir = scratch(dir, "st_dim_users_run") // rebuilt per run: the sink IS the op
    val dimPath = new org.apache.hadoop.fs.Path(dimDir)
    val fs = dimPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dimPath, true)
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").desc)
    val q = withStatePartitions(spark, 8) {
      spark.readStream.schema(schema).parquet(landing)
        .select(col("user_id"), col("event_type"), col("ts"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val cols = Seq("user_id", "event_type", "ts")
          val existing =
            if (fs.exists(new org.apache.hadoop.fs.Path(dimDir, "_SUCCESS")))
              batch.sparkSession.read.parquet(dimDir)
            else batch.select(cols.map(col): _*).limit(0)
          val merged = existing.unionByName(batch.select(cols.map(col): _*))
            .withColumn("__rn", row_number().over(byUser))
            .filter(col("__rn") === 1).drop("__rn")
          // write to a staging dir (the plan still READS dimDir — it must
          // stay intact until the write finishes), then atomically swap;
          // foreachBatch runs batches strictly sequentially
          merged.write.mode("overwrite").parquet(dimDir + "_next")
          fs.delete(dimPath, true)
          fs.rename(new org.apache.hadoop.fs.Path(dimDir + "_next"), dimPath)
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    spark.read.parquet(dimDir)
      .select(col("user_id"), col("event_type").as("last_event_type"),
        col("ts").cast(TimestampNTZType).as("last_ts"))
      .orderBy("user_id")
  }

  /** st7 — STREAMING DEDUP: `dropDuplicatesWithinWatermark` over an
    * at-least-once event feed (the Kafka-redelivery shape). The landing is
    * planted with exact duplicate rows (every user_id % 10 == 0 event
    * re-delivered once); the stream drops re-deliveries whose dedup key
    * was already seen, with state EVICTED by the watermark — at scale the
    * store holds only the keys of the sliding watermark window, not the
    * full history. Output carries exactly the dedup-key columns, so the
    * result is independent of WHICH physical copy the state kept and of
    * how `AvailableNow` chunks the replay (the delay is DERIVED from the
    * bounded fixture's span via spanCoveringDelay; a live run would use
    * minutes). Oracle: SELECT DISTINCT. */
  val stStreamDedup: QueryDef = QueryDef(
    "st_stream_dedup",
    Some("""
      SELECT DISTINCT user_id, event_type, ts
      FROM events
      ORDER BY user_id, ts, event_type
    """)) { (spark, dir) =>
    val base = eventsLanding(spark, dir)
    val sig = sourceSig(spark, dir, "events")
    val landing = scratch(dir, s"events_dup_landing_v1_$sig")
    val marker = new org.apache.hadoop.fs.Path(landing, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      val ev = spark.read.parquet(base)
      ev.unionAll(ev.filter(col("user_id") % 10 === 0))
        .write.mode("overwrite").parquet(landing)
    }
    val schema = spark.read.parquet(landing).schema
    val sinkName = "graft_st_dedup_" + dirTag(dir)
    val delay = spanCoveringDelay(spark, landing)
    val q = withStatePartitions(spark, 8) {
      spark.readStream.schema(schema).parquet(landing)
        .select(col("user_id"), col("event_type"), col("ts"))
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark("user_id", "event_type", "ts")
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    spark.table(sinkName)
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .orderBy("user_id", "ts", "event_type")
  }

  /** [[eventsLanding]] plus two far-future SENTINEL rows (user_id = -1, one
    * per joined event_type, ts = max(ts) + 90 days). OUTER stream-stream
    * join results only emit when the watermark passes a row's state-expiry
    * bound — under the suite's span-covering delay the watermark never
    * clears the real data span, so without a sentinel every unmatched row
    * would stay unemitted at termination. The sentinels advance the final
    * watermark ~53 days past the real span (90d − span − 2d), forcing every
    * outer result to flush before `AvailableNow` stops; consumers filter
    * `user_id ≥ 0` after the sink. Sentinels are staged as a second,
    * later-mtime write so a multi-batch replay always processes them LAST
    * (see inline note), and a `_GRAFT_READY` marker gates reuse. */
  private def eventsLandingSentinel(spark: SparkSession, dir: String): String = {
    val sig = sourceSig(spark, dir, "events")
    val landing = scratch(dir, s"events_ts_sentinel_v2_$sig")
    // custom marker, created only after BOTH writes below: parquet's own
    // _SUCCESS lands after the first write, so guarding on it could serve
    // a landing whose sentinels were never appended
    val marker = new org.apache.hadoop.fs.Path(landing, "_GRAFT_READY")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      import spark.implicits._
      val base = spark.read.parquet(eventsLanding(spark, dir))
      base.write.mode("overwrite").parquet(landing)
      // sentinels go in a SECOND write so their files carry strictly later
      // modification times: FileStreamSource replays files oldest-first,
      // so even if AvailableNow splits the landing into many micro-batches
      // (maxFilesPerTrigger, a larger SF), every real file is processed —
      // and in watermark state — before a sentinel can advance the
      // watermark past the real span and expire rows as late. A single
      // mixed write had no such ordering guarantee.
      val sentinels = base.agg(expr("max(ts) + INTERVAL 90 DAYS").as("ts"))
        .crossJoin(Seq("purchase" -> -1L, "click" -> -2L)
          .toDF("event_type", "event_id"))
        .select(col("event_id"), col("ts"), lit(-1L).as("user_id"),
          col("event_type"), lit(0.0).as("value"),
          lit(null).cast(StringType).as("props"))
      sentinels.coalesce(1).write.mode("append").parquet(landing)
      fs.create(marker, true).close()
    }
    landing
  }

  /** The left-outer join pipeline behind [[stStreamJoinLeft]], with the
    * per-batch file cap injectable so StreamsSpec can force a MULTI-batch
    * replay (the file-order hazard the sentinel staging exists to survive)
    * while the gate itself runs the source default. */
  private[graft] def runStreamJoinLeft(
      spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val landing = eventsLandingSentinel(spark, dir)
    val schema = spark.read.parquet(landing).schema
    val sinkName = "graft_st_ssjoin_left_" + dirTag(dir) +
      maxFilesPerTrigger.map(n => s"_mft$n").getOrElse("")
    val delay = spanCoveringDelay(spark, eventsLanding(spark, dir))
    def src = {
      val r = spark.readStream.schema(schema)
      maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
      r.parquet(landing)
    }
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val q = withStatePartitions(spark, 8) {
      purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 24 HOURS") &&
          col("click_ts") <= col("purchase_ts"),
        "leftOuter")
        .select(col("user_id"), col("purchase_ts"), col("click_ts"))
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    spark.table(sinkName)
      .filter(col("user_id") >= 0) // shed the watermark sentinels
      .withColumn("purchase_ts", col("purchase_ts").cast(TimestampNTZType))
      .withColumn("click_ts", col("click_ts").cast(TimestampNTZType))
      .orderBy("user_id", "purchase_ts", "click_ts")
  }

  /** st8 — watermarked LEFT OUTER stream-stream join: every purchase emits,
    * joined to the clicks that preceded it within 24h, or null-padded once
    * the watermark proves no matching click can still arrive. This is the
    * semantics [[stStreamStreamJoin]] cannot express (inner joins simply
    * drop unmatched rows; outer joins require the engine to hold the row in
    * state and PROVE absence via watermark passage — the state-expiry
    * contract that makes outer joins bounded-memory on an unbounded
    * stream). Same state posture as the inner join: 4 stores per partition,
    * retention bounded by the 24h window + delay. Oracle = the batch left
    * join; the sentinel mechanics (see [[eventsLandingSentinel]]) are
    * harness-only and filtered out. */
  val stStreamJoinLeft: QueryDef = QueryDef(
    "st_stream_join_left",
    Some("""
      SELECT p.user_id, p.ts AS purchase_ts, c.ts AS click_ts
      FROM events p LEFT JOIN events c ON p.user_id = c.user_id
       AND c.event_type = 'click'
       AND c.ts BETWEEN p.ts - INTERVAL 24 HOURS AND p.ts
      WHERE p.event_type = 'purchase'
      ORDER BY 1, 2, 3
    """))((spark, dir) => runStreamJoinLeft(spark, dir))

  /** The stream-static pipeline behind [[stStreamStaticJoin]], with a probe
    * hook so StreamsSpec can assert the two scale contracts on the FINISHED
    * query (zero state operators; broadcast dim side) without re-running
    * it. */
  private[graft] def runStreamStaticJoin(
      spark: SparkSession, dir: String,
      probe: org.apache.spark.sql.streaming.StreamingQuery => Unit = _ => ()): DataFrame = {
    val landing = eventsLanding(spark, dir)
    val schema = spark.read.parquet(landing).schema
    val sinkName = "graft_st_static_" + dirTag(dir)
    // the static side: customer enriched with its nation name, pre-joined
    // ONCE in batch and explicitly broadcast — every micro-batch then joins
    // map-side against the same broadcast table. The % 3 restriction drops
    // a third of the dimension so the LEFT join's null path (events whose
    // user has no dim row → 'unknown') is genuinely exercised.
    val dim = broadcast(
      tbl(spark, dir, "customer").filter(col("c_custkey") % 3 =!= 1)
        .join(tbl(spark, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name")))
    val q = withStatePartitions(spark, 8) {
      spark.readStream.schema(schema).parquet(landing)
        .select(col("user_id"), col("event_type"),
          (dec2(col("value")) * 100).cast(LongType).as("cents"))
        .join(dim, col("user_id") === col("c_custkey"), "left_outer")
        .select(col("user_id"), col("event_type"), col("cents"),
          coalesce(col("n_name"), lit("unknown")).as("n_name"))
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    probe(q)
    // bounded batch summarization of the enriched stream for the oracle
    // compare (exact integer cents — no cross-row float sums)
    spark.table(sinkName)
      .groupBy("n_name", "event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"))
      .orderBy("n_name", "event_type")
  }

  /** st9 — STREAM-STATIC enrichment join (round-11 queue #4): the most
    * common production streaming pattern — a fact stream enriched against
    * a slowly-changing dimension table — and the one streaming shape this
    * file didn't cover. The static side is a batch DataFrame, so the join
    * is STATELESS: no watermark, no state store, nothing grows with stream
    * length (the spec asserts zero state operators), and the broadcast
    * keeps the stream side from ever shuffling — per micro-batch cost is
    * one map-side hash probe per event at any scale. Unmatched events
    * surface as 'unknown' rather than dropping (left outer), the
    * difference between an enrichment join and a filter. Oracle = the
    * equivalent batch left join + rollup. */
  val stStreamStaticJoin: QueryDef = QueryDef(
    "st_stream_static_join",
    Some("""
      WITH dim AS (
        SELECT c_custkey, n_name
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c_custkey % 3 <> 1)
      SELECT coalesce(d.n_name, 'unknown') AS n_name, e.event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents
      FROM events e LEFT JOIN dim d ON e.user_id = d.c_custkey
      GROUP BY 1, 2
      ORDER BY 1, 2
    """))((spark, dir) => runStreamStaticJoin(spark, dir))

  val all: Seq[QueryDef] = Seq(
    stHourlyWindows, stSessionWindows, stJsonProps, stStatefulUserAgg,
    stStreamStreamJoin, stForeachBatchUpsert, stStreamDedup, stStreamJoinLeft,
    stStreamStaticJoin)
}
