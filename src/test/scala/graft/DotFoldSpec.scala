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

  test("bit-identical to a sequential driver-side fold on real embeddings") {
    // driver-side reference fold — immune to the FuseDotFold rewrite (a
    // Spark-vs-Spark comparison would silently compare the kernel to itself)
    val s = spark
    import s.implicits._
    val e = core.tbl(spark, sfDir, "embeddings").limit(200)
    val qv = e.filter(col("vec_id") === 0)
      .select("embedding").as[Array[Float]].head()
    val rows = e.select(col("vec_id"), call_function("graft_dot", col("embedding"),
        typedLit(qv)).as("native"), col("embedding"))
      .as[(Long, Double, Array[Float])].collect()
    rows.foreach { case (id, native, emb) =>
      var acc = 0.0
      for (i <- emb.indices) acc += emb(i).toDouble * qv(i).toDouble
      assert(java.lang.Double.doubleToLongBits(native) ==
        java.lang.Double.doubleToLongBits(acc), s"vec_id=$id drifted")
    }
  }

  test("FuseDotFold rewrites the declarative HOF fold to the native kernel") {
    val e = core.tbl(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val df = e.crossJoin(broadcast(q)).select(hofDot(col("embedding"), col("qv")).as("s"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"),
      s"HOF fold not fused to DotFold:\n$optimized")
    assert(!optimized.contains("aggregate(zip_with"),
      "interpreted HOF survived the rewrite")
    // and the rewrite must not fire on shapes it can't reproduce bit-exactly:
    // float×float product (no double casts) rounds differently
    val floatMul = e.select(
      aggregate(zip_with(col("embedding"), col("embedding"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("s"))
    assert(!floatMul.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      "rule fused a float-precision product — not bit-exact")
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
