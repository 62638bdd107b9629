package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The native dot-product expression: bit-parity with the declarative HOF
  * fold it replaces, null/length edge semantics, SQL registration via
  * GraftExtensions, and the codegen claim. */
class DotFoldSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the interpreted HOF fold on real embeddings") {
    val e = core.tbl(spark, sfDir, "embeddings").limit(200)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = e.crossJoin(broadcast(q)).select(
      call_function("graft_dot", col("embedding"), col("qv")).as("native"),
      hofDot(col("embedding"), col("qv")).as("hof"))
    val mismatches = both.filter(
      // bit-level comparison: NaN-safe <=> plus exact double equality
      !(col("native") <=> col("hof"))).count()
    assert(mismatches === 0)
  }

  test("null element, null array, and length mismatch all yield NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f)),       // ok: 11.0
      (Seq[java.lang.Float](1f, null), Seq[java.lang.Float](3f, 4f)),     // null elem
      (null, Seq[java.lang.Float](3f, 4f)),                               // null array
      (Seq[java.lang.Float](1f), Seq[java.lang.Float](3f, 4f))            // len mismatch
    ).toDF("a", "b")
    val out = df.select(call_function("graft_dot", col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0) && out(3).isNullAt(0))
  }

  test("registered in SQL, works on float and double arrays, rejects others") {
    val r = spark.sql(
      "SELECT graft_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), CAST(array(3.0, 4.0) AS ARRAY<FLOAT>))," +
        " graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))").head()
    assert(r.getDouble(0) === 11.0 && r.getDouble(1) === 11.0)
    val err = intercept[Exception](
      spark.sql("SELECT graft_dot(array(1, 2), array(3, 4))").head())
    assert(err.getMessage.contains("graft_dot"))
  }

  test("runs inside whole-stage codegen (not interpreted, no fallback)") {
    val e = core.tbl(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val df = e.crossJoin(broadcast(q))
      .select(call_function("graft_dot", col("embedding"), col("qv")).as("s"))
    df.collect()
    // the projection holding graft_dot must sit under a WholeStageCodegen
    // node — an interpreted/fallback expression would split the span
    val plan = df.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator.find(_.contains("graft_dot")).getOrElse("")
    assert(projLine.contains("*"), // the codegen marker on Project
      s"graft_dot projection not codegen'd:\n$plan")
  }
}
