package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Streaming-surface tests: the bounded AvailableNow runs must agree with
  * their batch equivalents computed in the same session — an in-process
  * replica of what the DuckDB oracle checks, plus stateful-operator
  * invariants the oracle can't see (state bounded by keys). */
class StreamsSpec extends SparkSpec {

  test("st1 streaming hourly windows equal the batch groupBy on the same data") {
    val streamed = Streams.stHourlyWindows.run(spark, sfDir)
    val batch = core.events(spark, sfDir)
      // date_trunc implicitly casts NTZ→TIMESTAMP; cast back so the rows
      // compare type-identically with the streamed NTZ output
      .groupBy(date_trunc("hour", col("ts"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("window_start", "event_type")
    assert(streamed.count() === batch.count())
    val s = streamed.select("window_start", "event_type", "n_events").collect()
    val b = batch.collect()
    s.zip(b).zipWithIndex.foreach { case ((sr, br), i) =>
      assert(sr === br, s"row $i differs: streamed=$sr batch=$br")
    }
  }

  test("st4 stateful per-user aggregates equal the batch groupBy") {
    val stateful = Streams.stStatefulUserAgg.run(spark, sfDir)
    val batch = core.events(spark, sfDir).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), min("ts").as("first_ts"), max("ts").as("last_ts"))
      .orderBy("user_id")
    assert(stateful.count() === batch.count()) // one state row per user, drained once
    val s = stateful.select("user_id", "n_events", "first_ts", "last_ts").collect()
    val b = batch.collect()
    assert(s.sameElements(b))
  }

  test("st2 session windows: every session spans >= 1 event and sessions don't overlap per user") {
    val sessions = Streams.stSessionWindows.run(spark, sfDir).collect()
    assert(sessions.nonEmpty)
    assert(sessions.forall(_.getAs[Long]("n_events") >= 1))
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      // session bounds are TIMESTAMP_NTZ → java.time.LocalDateTime
      val sorted = rows.sortBy(_.getAs[java.time.LocalDateTime]("session_start"))(
        Ordering.fromLessThan(_ isBefore _))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!b.getAs[java.time.LocalDateTime]("session_start")
            .isBefore(a.getAs[java.time.LocalDateTime]("session_end")),
            s"overlapping sessions for user ${a.getAs[Long]("user_id")}")
        case _ =>
      }
    }
  }

  // multiset view: a Set comparison would hide multiplicity bugs (e.g. a
  // match re-emitted across micro-batches in the stream-stream join)
  private def multiset(rows: Array[org.apache.spark.sql.Row]): Map[Seq[Any], Int] =
    rows.map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  test("st5 stream-stream join equals the batch interval join on the same data") {
    import org.apache.spark.sql.functions._
    val streamed = multiset(streaming.Streams.stStreamStreamJoin.run(spark, sfDir)
      .collect())
    val ev = core.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("click_ts"))
    val batch = multiset(p.join(c, col("user_id") === col("cu") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 24 HOURS") &&
        col("click_ts") <= col("purchase_ts"))
      .select("user_id", "purchase_ts", "click_ts")
      .collect())
    assert(streamed === batch)
    assert(batch.nonEmpty, "fixture produced zero matches — test is vacuous")
  }

  test("st6 foreachBatch upsert converges to the batch latest-event-per-user state") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val streamed = multiset(streaming.Streams.stForeachBatchUpsert.run(spark, sfDir)
      .collect())
    val latest = Window.partitionBy("user_id").orderBy(col("ts").desc)
    val batch = multiset(core.events(spark, sfDir)
      .withColumn("__rn", row_number().over(latest)).filter(col("__rn") === 1)
      .select(col("user_id"), col("event_type").as("last_event_type"),
        col("ts").as("last_ts"))
      .collect())
    assert(streamed === batch)
  }

  test("st7 streaming dedup drops planted re-deliveries: exactly one row per distinct key") {
    val streamed = multiset(Streams.stStreamDedup.run(spark, sfDir).collect())
    val batch = multiset(core.events(spark, sfDir)
      .select("user_id", "event_type", "ts").distinct().collect())
    assert(streamed === batch) // multiset equality: no dup survives, none re-emitted
  }

  test("st8 left-outer join survives a MULTI-batch replay (maxFilesPerTrigger=1)") {
    // the file-order hazard the sentinel staging must survive: when the
    // replay splits into many micro-batches, the later-mtime sentinel files
    // must process LAST, or the watermark would jump past the real span and
    // expire real rows as late. One file per trigger is the worst case.
    val multi = multiset(
      streaming.Streams.runStreamJoinLeft(spark, sfDir, Some(1)).collect())
    val single = multiset(streaming.Streams.stStreamJoinLeft.run(spark, sfDir)
      .collect())
    assert(multi === single)
    // and both match the batch left join computed in-session
    val e = core.events(spark, sfDir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val batch = multiset(p.join(c,
        col("user_id") === col("c_user") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 24 HOURS") &&
          col("click_ts") <= col("purchase_ts"), "left")
      .select("user_id", "purchase_ts", "click_ts").collect())
    assert(multi === batch)
  }

  test("st9 stream-static join: stateless, dim broadcast, equals the batch join") {
    var stateOps = -1
    var planTxt = ""
    val streamed = streaming.Streams.runStreamStaticJoin(spark, sfDir, q => {
      // zero state operators: the static side makes the join stateless —
      // state can NEVER grow with stream length (the gate's scale contract)
      stateOps = q.recentProgress.map(_.stateOperators.length).sum
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out))(q.explain(extended = false))
      planTxt = out.toString
    })
    val rows = streamed.collect()
    assert(stateOps === 0, s"stream-static join reported $stateOps state operators")
    assert(planTxt.contains("BroadcastHashJoin"),
      s"dim side did not broadcast:\n$planTxt")
    // the fixture must exercise the outer null path
    assert(rows.exists(_.getAs[String]("n_name") == "unknown"))
    // equals the batch left join + rollup computed in-session
    val dim = core.tbl(spark, sfDir, "customer").filter(col("c_custkey") % 3 =!= 1)
      .join(core.tbl(spark, sfDir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val batch = core.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        (core.dec2(col("value")) * 100).cast(org.apache.spark.sql.types.LongType).as("cents"))
      .join(dim, col("user_id") === col("c_custkey"), "left_outer")
      .groupBy(coalesce(col("n_name"), lit("unknown")).as("n_name"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"))
      .orderBy("n_name", "event_type")
    assert(multiset(rows) === multiset(batch.collect()))
  }
}
