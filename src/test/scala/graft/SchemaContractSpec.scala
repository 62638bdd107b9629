package graft

import org.apache.spark.sql.types._

/** Declared-schema contracts for the driver-generated tables (SURVEY.md
  * §1.3: explicit StructType per source, asserted on read). The engine's
  * oracles, planted-dup offsets, and watermark gates all assume these
  * shapes — a regenerated fixture that drifts (new column, widened type,
  * ns→µs timestamps) should fail HERE with a readable diff, not as a
  * mysterious hash mismatch three gates downstream. `events.ts` admits the
  * shapes the driver has actually shipped (INT64 nanos via nanosAsLong=true,
  * native TIMESTAMP(MICROS)); core.eventsUs owns the normalization. */
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
      // The driver has shipped ts as INT64 nanos (read as LONG via
      // nanosAsLong=true) and as native TIMESTAMP(MICROS) in different
      // rounds; core.eventsUs adapts to both, so the contract admits both.
      "ts" -> TimestampNTZType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))

  /** Alternate types the contract also admits, keyed by (table, column):
    * shapes the driver has actually shipped in past rounds and that the
    * engine's read adapters normalize away. */
  private val alsoAllowed: Map[(String, String), Set[DataType]] = Map(
    ("events", "ts") -> Set[DataType](LongType, TimestampType))

  test("every driver table matches its declared schema (names, types, order)") {
    val diffs = core.tableNames.flatMap { t =>
      val got = core.tbl(spark, sfDir, t).schema.fields
        .map(f => (f.name, f.dataType)).toSeq
      val want = expected(t)
      val ok = got.size == want.size && got.zip(want).forall {
        case ((gn, gt), (wn, wt)) =>
          gn == wn && (gt == wt || alsoAllowed.getOrElse((t, gn), Set.empty)(gt))
      }
      if (ok) None
      else Some(s"$t:\n  want ${want.map { case (n, d) => (n, d.simpleString) }}" +
        s"\n  got  ${got.map { case (n, d) => (n, d.simpleString) }}")
    }
    assert(diffs.isEmpty, s"schema drift:\n${diffs.mkString("\n")}")
  }

  test("the contract covers every shipped table and nothing more") {
    assert(expected.keySet === core.tableNames.toSet)
  }
}
