package graft

import graft.transform.Cleaning
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-operator unit tests over seeded-defect fixtures, mirroring the
  * reference's transformer suite (reference `tests/test_transformers.py:29–215`
  * and FIXTURES.md §A): duplicate keys, null quantity/total, mixed-case
  * status, invalid tier, out-of-range rating, orphaned orders. */
class CleaningSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  // sample_orders analog: o2 duplicated, null quantity/total on the dup,
  // mixed-case statuses (test_transformers.py:29–45)
  private def sampleOrders = Seq(
    ("o1", "c1", "2024-01-15 10:00:00", Some(2), Some(20.0), "completed"),
    ("o2", "c2", "2024-01-16 11:00:00", None, None, "Cancelled"),
    ("o2", "c2", "2024-01-16 11:00:00", None, None, "Cancelled"),
    ("o3", "c_missing", "2024-01-17 12:00:00", Some(1), Some(5.5), "PENDING"),
    ("o4", "c1", "2024-01-18 13:00:00", Some(3), Some(30.0), "refunded")
  ).toDF("order_id", "customer_id", "order_date", "quantity", "total_amount", "status")

  test("dedup keep-first drops exact duplicate keys (test_transformers.py:90–93)") {
    val out = Cleaning.dedupKeepFirst(sampleOrders, Seq("order_id"), Seq(col("status").asc_nulls_first))
    assert(out.count() === 4)
    assert(out.select("order_id").as[String].collect().sorted === Array("o1", "o2", "o3", "o4"))
  }

  test("dedup is deterministic under a tie-breaker and idempotent") {
    val df = Seq(("k1", "b"), ("k1", "a"), ("k2", "z")).toDF("k", "v")
    val once = Cleaning.dedupKeepFirst(df, Seq("k"), Seq(col("v").asc_nulls_first))
    assert(once.orderBy("k").as[(String, String)].collect() === Array(("k1", "a"), ("k2", "z")))
    val twice = Cleaning.dedupKeepFirst(once, Seq("k"), Seq(col("v").asc_nulls_first))
    assert(twice.count() === once.count())
  }

  test("null quantity fills with 1, null total recomputes qty*price (test_transformers.py:95–104)") {
    val out = sampleOrders
      .withColumn("quantity", coalesce(col("quantity"), lit(1)))
      .withColumn("total_amount",
        Cleaning.recomputeTotal(col("total_amount"), col("quantity"), lit(5.5)))
    assert(out.filter(col("quantity").isNull || col("total_amount").isNull).count() === 0)
    val o2 = out.filter(col("order_id") === "o2").select("quantity", "total_amount")
      .as[(Int, Double)].head()
    assert(o2 === ((1, 5.5)))
  }

  test("status normalizes to uppercase invariant (test_transformers.py:106–109)") {
    val statuses = sampleOrders.select(Cleaning.normalizeStatus(col("status")).as("s"))
      .as[String].collect().toSet
    assert(statuses === Set("COMPLETED", "CANCELLED", "PENDING", "REFUNDED"))
  }

  test("calendar derivations exist and use the 0=Monday convention (F9)") {
    // 2024-01-15 was a Monday; 2024-01-20/21 a weekend
    val out = Seq("2024-01-15", "2024-01-20", "2024-01-21")
      .toDF("d").select(core.dowMon0(col("d").cast(DateType)).as("dow"))
    assert(out.as[Int].collect() === Array(0, 5, 6))
  }

  test("email lowercases with trim (test_transformers.py / stg_customers.sql:8)") {
    val out = Seq("  Alice.Smith@Email.COM ").toDF("e")
      .select(Cleaning.normalizeEmail(col("e"))).as[String].head()
    assert(out === "alice.smith@email.com")
  }

  test("invalid tier defaults to BRONZE, valid tiers survive (test_transformers.py:134–138)") {
    val tiers = Seq("GOLD", "INVALID_TIER", "bronze", "PLATINUM").toDF("t")
      .select(Cleaning.validateDomain(col("t"),
        Seq("BRONZE", "SILVER", "GOLD", "PLATINUM"), "BRONZE").as("t"))
      .as[String].collect()
    // lowercase 'bronze' is OUT of domain pre-normalization, like the reference
    assert(tiers === Array("GOLD", "BRONZE", "BRONZE", "PLATINUM"))
  }

  test("rating clamps into [1,5] (test_transformers.py:156–159)") {
    val out = Seq(7, 0, -3, 3, 5, 1).toDF("r")
      .select(Cleaning.clamp(col("r"), lit(1), lit(5)).as("r")).as[Int].collect()
    assert(out === Array(5, 1, 1, 3, 5, 1))
    assert(out.forall(r => r >= 1 && r <= 5))
  }

  test("sentiment buckets cover the full domain (test_transformers.py:165–170)") {
    val out = Seq(1, 2, 3, 4, 5).toDF("r")
      .select(Cleaning.sentiment(col("r")).as("s")).as[String].collect()
    assert(out === Array("negative", "negative", "neutral", "positive", "positive"))
  }

  test("integrity filter removes orphaned orders only (test_transformers.py:178–187)") {
    val customers = Seq("c1", "c2").toDF("customer_id")
    val kept = Cleaning.integrityFilter(sampleOrders, customers, "customer_id")
    assert(kept.count() === 4) // o3 (c_missing) dropped; dup o2 rows both kept
    assert(!kept.select("customer_id").as[String].collect().contains("c_missing"))
    // reject accounting = anti side
    val rejected = sampleOrders.join(customers, Seq("customer_id"), "left_anti")
    assert(rejected.count() === 1)
  }

  test("lenient timestamp parse: invalid strings become null, valid parse (F8)") {
    val out = Seq("2024-01-15 10:00:00", "not-a-date")
      .toDF("s").select(try_to_timestamp(col("s")).as("ts"))
    assert(out.filter(col("ts").isNotNull).count() === 1)
    assert(out.filter(col("ts").isNull).count() === 1)
  }

  test("no-null invariants after full cleaning chain (test_transformers.py:203–215)") {
    val cleaned = sampleOrders
      .transform(df => Cleaning.dedupKeepFirst(df, Seq("order_id"), Seq(col("status").asc_nulls_first)))
      .withColumn("quantity", coalesce(col("quantity"), lit(1)))
      .withColumn("total_amount", Cleaning.recomputeTotal(col("total_amount"), col("quantity"), lit(5.5)))
      .withColumn("status", Cleaning.normalizeStatus(col("status")))
      .withColumn("order_month", month(col("order_date").cast(TimestampType)))
    val anyNull = cleaned.columns.map(c => col(c).isNull).reduce(_ || _)
    assert(cleaned.filter(anyNull).count() === 0)
    assert(cleaned.count() === 4)
  }
}
