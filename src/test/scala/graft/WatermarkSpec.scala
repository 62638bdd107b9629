package graft

import org.apache.spark.sql.functions._
import java.time.LocalDate

/** The persisted high-watermark checkpoint: monotonic advancement,
  * persistence across reads, invalidation when the source is regenerated,
  * and the extract→advance→extract-empty cycle. */
class WatermarkSpec extends SparkSpec {
  import sources.Watermark

  private val default = LocalDate.parse("1990-01-01")

  test("watermark persists, advances monotonically, and resets") {
    Watermark.reset(spark, sfDir, "orders")
    assert(Watermark.read(spark, sfDir, "orders", default) === default)
    assert(Watermark.advance(spark, sfDir, "orders",
      LocalDate.parse("1995-06-01")) === LocalDate.parse("1995-06-01"))
    assert(Watermark.read(spark, sfDir, "orders", default)
      === LocalDate.parse("1995-06-01"))
    // a lagging re-run may not move the checkpoint backwards
    assert(Watermark.advance(spark, sfDir, "orders",
      LocalDate.parse("1994-01-01")) === LocalDate.parse("1995-06-01"))
    assert(Watermark.read(spark, sfDir, "orders", default)
      === LocalDate.parse("1995-06-01"))
    assert(Watermark.advance(spark, sfDir, "orders",
      LocalDate.parse("1996-02-02")) === LocalDate.parse("1996-02-02"))
    Watermark.reset(spark, sfDir, "orders")
    assert(Watermark.read(spark, sfDir, "orders", default) === default)
  }

  test("sequence-id watermark: monotonic long cycle, own tag, distinct from date store") {
    Watermark.reset(spark, sfDir, "customer", tag = "idtest")
    assert(Watermark.readLong(spark, sfDir, "customer", 7L, tag = "idtest") === 7L)
    assert(Watermark.advanceLong(spark, sfDir, "customer", 100L, tag = "idtest") === 100L)
    // a lagging re-run may not move the checkpoint backwards
    assert(Watermark.advanceLong(spark, sfDir, "customer", 50L, tag = "idtest") === 100L)
    assert(Watermark.readLong(spark, sfDir, "customer", 7L, tag = "idtest") === 100L)
    Watermark.reset(spark, sfDir, "customer", tag = "idtest")
  }

  test("customers JDBC mirror: extract past seed, advance, second extract empty") {
    val out = sources.Ingest.sJdbcCustomers.run(spark, sfDir)
    assert(out.count() > 0)
    // the gate advanced the checkpoint to the batch max — extracting past
    // the stored watermark again is provably empty (daily-job idempotence)
    val wm = Watermark.readLong(spark, sfDir, "customer", 0L, tag = "jdbc")
    assert(wm > 100L)
    assert(sources.Ingest.jdbcCustomersPast(spark, sfDir, wm).count() === 0L)
  }

  test("live JDBC upsert: conflicts carry day-2 values with the date bump, day-1 rows untouched") {
    val rows = sources.Ingest.sJdbcUpsert.run(spark, sfDir).collect()
    val cust = core.tbl(spark, sfDir, "customer")
    val nEven = cust.filter(col("c_custkey") % 2 === 0).count()
    val nDay1Odd = cust.filter(col("c_custkey") % 2 =!= 0
      && col("c_custkey") % 3 =!= 1).count()
    // final state = every change-batch key + the day-1 keys it never touched
    assert(rows.length.toLong === nEven + nDay1Odd)
    val (d2, d1) = rows.partition(
      _.getAs[java.sql.Timestamp]("updated_at").toString.startsWith("2026-02-02"))
    // every conflict/insert row carries day 2's bump AND day 2's values
    // (the uppercased name); every untouched row keeps day 1's exactly
    assert(d2.length.toLong === nEven)
    assert(d2.forall(r => r.getAs[Long]("customer_id") % 2 == 0))
    // compare against the SOURCE rows directly (not the case shape of the
    // generated names, which a generator change could silently invalidate)
    val nameOf = cust.select(col("c_custkey"), col("c_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d2.forall(r => r.getAs[String]("full_name")
      === nameOf(r.getAs[Long]("customer_id")).toUpperCase))
    assert(d1.forall(r => r.getAs[Long]("customer_id") % 2 != 0
      && r.getAs[Long]("customer_id") % 3 != 1))
    assert(d1.forall(r => r.getAs[String]("full_name")
      === nameOf(r.getAs[Long]("customer_id"))))
  }

  test("watermark-delta upsert lands the same final state as the full-batch upsert") {
    val inc = sources.Ingest.sJdbcUpsertIncremental.run(spark, sfDir).collect()
    val full = sources.Ingest.sJdbcUpsert.run(spark, sfDir).collect()
    // both gates order by customer_id — row-identical end to end (the
    // gate also anti-join-proves this in-gate before returning)
    assert(inc.length === full.length)
    inc.zip(full).foreach { case (a, b) => assert(a === b) }
    // the staged loop left the checkpoint at the batch max — day 2
    assert(Watermark.read(spark, sfDir, "customer", default, tag = "dimw")
      === LocalDate.parse("2026-02-02"))
  }

  test("CSV landing accounts every planted malformed row, drops none silently") {
    val r = sources.Ingest.sCsvRejects.run(spark, sfDir).head()
    val expectedBad = core.tbl(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 97 === 0).count()
    assert(r.getAs[Long]("n_bad") === expectedBad)
    assert(r.getAs[Long]("n_rows") === r.getAs[Long]("n_good") + r.getAs[Long]("n_bad"))
    assert(r.getAs[Double]("revenue_good") > 0.0)
  }

  test("a regenerated source starts from a fresh watermark, not a stale checkpoint") {
    val tmp = s"${sys.props("user.dir")}/target/wm-regen-test"
    def writeSource(n: Int): Unit =
      spark.range(n).select(col("id").as("k"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    writeSource(10)
    Watermark.reset(spark, tmp, "orders")
    Watermark.advance(spark, tmp, "orders", LocalDate.parse("1998-08-01"))
    assert(Watermark.read(spark, tmp, "orders", default)
      === LocalDate.parse("1998-08-01"))
    // regenerate with different content → new signature → checkpoint no
    // longer applies (extracting "past 1998-08-01" from new data would
    // silently drop everything)
    writeSource(11)
    assert(Watermark.read(spark, tmp, "orders", default) === default)
  }

  test("checkpointed cycle: first extract non-empty, post-advance extract empty") {
    val row = Watermark.sWatermarkStore.run(spark, sfDir).head()
    assert(row.getAs[Long]("first_extract_rows") > 0)
    assert(row.getAs[Long]("second_extract_rows") === 0L)
    // the store now holds the advanced watermark — a rerun starts there
    val stored = Watermark.read(spark, sfDir, "orders", default)
    assert(stored.isAfter(LocalDate.parse("1998-06-30")))
  }
}
