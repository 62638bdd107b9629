package graft

import org.apache.spark.sql.functions._

/** Semantics and plan-shape checks for the behavior analytics operators
  * (`analytics/Behavior.scala`) and the two new quality diagnostics. The
  * golden file pins exact values; these tests pin the INVARIANTS that make
  * the values right, so a future edit that keeps rows but breaks meaning
  * (a gap comparison off by one, a funnel step losing its ordering) fails
  * loudly.
  */
class BehaviorSpec extends SparkSpec {
  private val GapUs = 1800L * 1000000L

  test("sessions partition the event stream: per-user event counts add up") {
    val sessions = analytics.Behavior.aSessionizeGaps.run(spark, sfDir)
    val perUserSessions = sessions.groupBy("user_id")
      .agg(sum("n_events").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perUserEvents = core.events(spark, sfDir).groupBy("user_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUserSessions === perUserEvents,
      "sessionization dropped or duplicated events")
  }

  test("consecutive sessions of a user are separated by more than the gap") {
    val sessions = analytics.Behavior.aSessionizeGaps.run(spark, sfDir)
      .select(col("user_id"), col("session_id"),
        unix_micros(col("session_start").cast("timestamp")).as("start_us"),
        unix_micros(col("session_end").cast("timestamp")).as("end_us"))
    val offenders = sessions.as("a")
      .join(sessions.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.session_id") + 1 === col("b.session_id"))
      .filter(col("b.start_us") - col("a.end_us") <= GapUs)
      .count()
    assert(offenders === 0,
      s"$offenders session pairs closer than the 30-min gap — boundary predicate broken")
    // and within a session the span is finite and non-negative
    val bad = sessions.filter(col("end_us") < col("start_us")).count()
    assert(bad === 0)
  }

  test("funnel steps are monotonically shrinking and strictly ordered") {
    val row = analytics.Behavior.aFunnelSteps.run(spark, sfDir).collect().head
    val (ns, nv, np) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(ns >= nv && nv >= np, s"funnel grew downstream: $ns -> $nv -> $np")
    assert(ns > 0, "fixture has no signups — funnel gate is vacuous")
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0)
    assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0)
  }

  test("snapshot diff classes reconcile against independently derived counts") {
    val got = quality.Quality.qSnapshotDiff.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = core.tbl(spark, sfDir, "orders")
    val nAdded = orders.filter(col("o_orderkey") % 103 === 5).count()
    val nRemoved = orders.filter(col("o_orderkey") % 101 === 0).count()
    // changed = price-bumped keys that survived the delete
    val nChanged = orders
      .filter(col("o_orderkey") % 97 === 3 && col("o_orderkey") % 101 =!= 0).count()
    val nTotal = orders.count()
    assert(got("added") === nAdded)
    assert(got("removed") === nRemoved)
    assert(got("changed") === nChanged)
    assert(got("unchanged") === nTotal - nRemoved - nChanged)
  }

  test("centroids match a driver-side recomputation at any partitioning") {
    val got = llm.Similarity.centroidVectors(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // brute-force reference: same fixed-point quantization, computed
    // single-threaded on the driver
    val rows = core.tbl(spark, sfDir, "embeddings")
      .select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
    val expect = rows.groupBy(_._1).map { case (label, vs) =>
      val dim = vs.head._2.length
      val sums = Array.fill(dim)(0L)
      vs.foreach { case (_, v) =>
        for (i <- 0 until dim) sums(i) += math.floor(v(i).toDouble * 1e7).toLong
      }
      label -> sums.map(s => s.toDouble / vs.length.toDouble / 1e7).toSeq
    }
    assert(got.keySet === expect.keySet)
    for (l <- got.keySet)
      assert(got(l) === expect(l), s"label $l centroid diverged from reference")
  }

  test("drift flags are exactly the >1%-relative-move metrics") {
    val rows = quality.Quality.qProfileDrift.run(spark, sfDir).collect()
    assert(rows.length === 4)
    for (r <- rows) {
      val (a, b, flag) = (r.getDouble(1), r.getDouble(2), r.getString(3))
      val expect = if (math.abs(b - a) > 0.01 * math.abs(a)) "DRIFT" else "STABLE"
      assert(flag === expect, s"metric ${r.getString(0)}: a=$a b=$b flagged $flag")
    }
    // the synthetic snapshot changes ~1% of rows and bumps prices — the
    // row-count metric must register as a real, detected drift... unless
    // adds and deletes happen to cancel inside the threshold; assert the
    // flag agrees with the actual delta rather than hard-coding it
  }

  test("sort-based group median agrees with Spark's buffering percentile aggregate") {
    val got = operators.Aggregates.aGroupMedian.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = core.tbl(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === ref.keySet)
    for (k <- got.keySet)
      assert(math.abs(got(k) - ref(k)) < 1e-6,
        s"group $k: sort-based ${got(k)} vs buffering ${ref(k)}")
  }

  test("keyset pages chain without gaps or overlaps into the full sorted prefix") {
    import org.apache.spark.sql.functions._
    val orders = core.tbl(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    def page(cursor: Option[(java.time.LocalDateTime, Long)], n: Int) = {
      val base = cursor match {
        case Some((d, k)) => orders.filter(col("o_orderdate") > lit(d) ||
          (col("o_orderdate") === lit(d) && col("o_orderkey") > k))
        case None => orders
      }
      base.orderBy("o_orderdate", "o_orderkey").limit(n).collect()
    }
    // chain 5 pages of 50 by cursor, compare against the direct top-250
    var cursor: Option[(java.time.LocalDateTime, Long)] = None
    val chained = (1 to 5).flatMap { _ =>
      val rows = page(cursor, 50)
      cursor = Some((rows.last.getAs[java.time.LocalDateTime](1), rows.last.getLong(0)))
      rows
    }
    val direct = page(None, 250)
    assert(chained.map(_.getLong(0)).toSeq === direct.map(_.getLong(0)).toSeq,
      "chained pages diverge from the directly-sorted prefix")
  }

  test("sessionization plans one data shuffle; heavy hitters avoids a global sort") {
    val sessPlan = analytics.Behavior.aSessionizeGaps.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    // exactly one hash exchange (user_id) — the windows and the session
    // aggregate must all reuse it; the only other exchange is the final
    // ORDER BY's range partitioning over already-aggregated rows
    val hashEx = "hashpartitioning".r.findAllIn(sessPlan).size
    assert(hashEx === 1, s"expected 1 hash exchange, got $hashEx:\n$sessPlan")
    val hhPlan = quality.Quality.qHeavyHitters.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(hhPlan.contains("TakeOrderedAndProject"),
      s"heavy hitters lost its top-k plan:\n$hhPlan")
  }
}
