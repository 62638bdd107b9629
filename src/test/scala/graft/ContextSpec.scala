package graft

import java.time.LocalDate
import java.time.temporal.ChronoUnit

/** RunContext reproducibility: the as-of date is the ONLY thing that moves
  * between runs, and runs with equal context are identical. */
class ContextSpec extends SparkSpec {

  private def ageDays(ctx: RunContext): Array[(Long, Int)] =
    transform.Cleaning.scalarFunctions(ctx).run(spark, sfDir)
      .selectExpr("o_orderkey", "age_days").collect()
      .map(r => (r.getLong(0), r.getInt(1)))

  test("two runs with the same asOfDate are bit-identical") {
    for (d <- Seq("1998-12-31", "1997-06-15")) {
      val ctx = RunContext(LocalDate.parse(d))
      val q = transform.Cleaning.scalarFunctions(ctx)
      val r1 = q.run(spark, sfDir).collect().map(_.toSeq)
      val r2 = q.run(spark, sfDir).collect().map(_.toSeq)
      assert(r1.sameElements(r2), s"non-reproducible run at asOfDate=$d")
    }
  }

  test("shifting asOfDate shifts every as-of derivation by exactly the day delta") {
    val d0 = LocalDate.parse("1998-12-31")
    val d1 = LocalDate.parse("1999-02-09")
    val delta = ChronoUnit.DAYS.between(d0, d1).toInt
    val base = ageDays(RunContext(d0)).toMap
    ageDays(RunContext(d1)).foreach { case (k, age) =>
      assert(age === base(k) + delta, s"order $k: age not shifted by $delta")
    }
  }
}
