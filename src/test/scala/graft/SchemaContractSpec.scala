package graft

import org.apache.spark.sql.types._

/** Declared-schema contracts for the driver-generated tables (SURVEY.md
  * §1.3: explicit StructType per source, asserted on read). The engine's
  * oracles, planted-dup offsets, and watermark gates all assume these
  * shapes — a regenerated fixture that drifts (new column, widened type,
  * ns→µs timestamps) should fail HERE with a readable diff, not as a
  * mysterious hash mismatch three gates downstream. `events.ts` is LongType
  * because sessions read TIMESTAMP(NANOS) via nanosAsLong=true; core.events
  * owns the µs conversion. */
class SchemaContractSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType,
      "ts" -> LongType, // TIMESTAMP(NANOS) read via nanosAsLong=true
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))

  test("every driver table matches its declared schema (names, types, order)") {
    val diffs = core.tableNames.flatMap { t =>
      val got = core.tbl(spark, sfDir, t).schema.fields
        .map(f => (f.name, f.dataType.simpleString)).toSeq
      val want = expected(t).map { case (n, dt) => (n, dt.simpleString) }
      if (got == want) None
      else Some(s"$t:\n  want $want\n  got  $got")
    }
    assert(diffs.isEmpty, s"schema drift:\n${diffs.mkString("\n")}")
  }

  test("the contract covers every shipped table and nothing more") {
    assert(expected.keySet === core.tableNames.toSet)
  }
}
