package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

/** Temporal join semantics on hand-built frames (exact expected matches,
  * including the tie and no-match edges) plus the plan invariant that the
  * range join never degenerates to a nested loop. */
class TemporalSpec extends SparkSpec {

  test("as-of join matches most recent prior click, includes ties, nulls when none") {
    val s = spark
    import s.implicits._
    val asof = operators.Temporal.jAsofEvent.run(spark, sfDir)
      .select("user_id", "purchase_ts", "last_click_ts")
    val ev = core.events(spark, sfDir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts").as[(Long, java.time.LocalDateTime)].collect()
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts").as[(Long, java.time.LocalDateTime)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted((x: java.time.LocalDateTime, y: java.time.LocalDateTime) => x.compareTo(y))).toMap
    // reference semantics, computed naively driver-side on the tiny sf
    val expected = purchases.map { case (u, pts) =>
      val prior = clicks.getOrElse(u, Array.empty[java.time.LocalDateTime])
        .filter(c => !c.isAfter(pts))
      (u, pts, if (prior.isEmpty) null else prior.last)
    }.toSet
    val got = asof.as[(Long, java.time.LocalDateTime, Option[java.time.LocalDateTime])]
      .collect().map { case (u, p, c) => (u, p, c.orNull) }.toSet
    assert(got === expected)
  }

  test("as-of ties at the same instant count as at-or-before (>= semantics)") {
    // synthetic: click exactly at the purchase timestamp must match
    val s = spark
    import s.implicits._
    // reuse the production operator by staging a tiny events table
    val dir = core.scratch(sfDir, "temporal_tie_fixture")
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-05 10:00:00"), 7L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-05 10:00:00"), 7L, "purchase", 2.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-04 10:00:00"), 8L, "purchase", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", unix_micros($"ts") * 1000) // raw nanos, like the driver files
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = operators.Temporal.jAsofEvent.run(spark, dir)
      .select("user_id", "last_click_ts").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(7L).isDefined, "same-instant click must match (>=, not >)")
    assert(out(8L).isEmpty, "user with no prior click gets NULL")
  }

  test("nearest as-of: gap is the minimum of the backward and forward as-of gaps") {
    // the defining law of direction='nearest': joined against the two
    // one-directional gates on (user, purchase), the nearest gap equals
    // min(backward gap, forward gap) wherever both exist, never exceeds
    // either where one exists, and dir names the winning side
    def keyed(rows: Array[org.apache.spark.sql.Row], gapCol: String) =
      rows.map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.time.LocalDateTime]("purchase_ts")) ->
        Option(r.getAs[java.lang.Long](gapCol)).map(_.toLong)).toMap
    val back = keyed(Temporal.jAsofEvent.run(spark, sfDir).collect(), "us_since_click")
    val fwd = keyed(Temporal.jAsofForward.run(spark, sfDir).collect(), "us_until_click")
    val near = Temporal.jAsofNearest.run(spark, sfDir).collect()
    assert(near.nonEmpty)
    near.foreach { r =>
      val k = (r.getAs[Long]("user_id"), r.getAs[java.time.LocalDateTime]("purchase_ts"))
      val g = Option(r.getAs[java.lang.Long]("us_gap")).map(_.toLong)
      val (b, f) = (back(k), fwd(k))
      // the forward GATE is at-or-after while the nearest arm is strictly
      // after; a zero forward gap coincides with a zero backward gap, so
      // min() is unaffected
      val expected = (b.toList ++ f.toList).reduceOption((x: Long, y: Long) => math.min(x, y))
      assert(g === expected, s"gap $g != min($b, $f) at $k")
      // dir is asserted EXHAUSTIVELY (a forward winner labeled 'back'
      // must fail here, not surface as an opaque hash mismatch)
      val dir = r.getAs[String]("dir")
      (b, f) match {
        case (None, None)         => assert(dir == null)
        case (Some(_), None)      => assert(dir === "back")
        case (None, Some(_))      => assert(dir === "fwd")
        case (Some(bb), Some(ff)) => assert(dir === (if (bb <= ff) "back" else "fwd"))
      }
    }
  }

  test("range join preserves empty windows and counts overlaps twice") {
    val out = operators.Temporal.jRangeWindows.run(spark, sfDir).collect()
    assert(out.length === 10, "all 10 windows present even if empty")
    val n = out.map(_.getLong(1)).sum
    // overlapping windows double-count: total matched rows must be >= the
    // number of distinct events inside the union of windows
    val ev = core.events(spark, sfDir)
    val distinctCovered = ev.filter(
      col("ts") >= lit("2024-01-01").cast("timestamp_ntz") &&
        col("ts") < lit("2024-02-02").cast("timestamp_ntz")).count()
    assert(n >= distinctCovered, s"matched $n < covered $distinctCovered")
  }

  test("range join plans as broadcast hash join — never a nested loop") {
    val df = operators.Temporal.jRangeWindows.run(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "bucket equi-join missing")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "range predicate degenerated to a nested loop")
  }
}
