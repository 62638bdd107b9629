package graft

import graft.operators.Linkage
import graft.sources.Ingest

/** Invariants of the blocking/entity-resolution and z-order layout gates
  * beyond the hash oracle: the blocking bound that caps candidate pairs,
  * and the measured locality win that is the entire point of z-ordering. */
class LayoutLinkageSpec extends SparkSpec {

  test("fuzzy match: blocks stay bounded and near-match pairs exist") {
    val rows = Linkage.dFuzzyMatch.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the block key drops the last two digits, so ≤100 entities per block —
    // the bound that keeps within-block scoring O(100²) regardless of scale
    assert(rows.forall(_.getAs[Long]("n_members") <= 100))
    assert(rows.map(_.getAs[Long]("n_pairs")).sum > 0)
    // pair count can never exceed the block's own pair space
    rows.foreach { r =>
      val m = r.getAs[Long]("n_members")
      assert(r.getAs[Long]("n_pairs") <= m * (m - 1) / 2)
    }
  }

  test("content-derived blocking: cap enforced, planted typo pairs recovered") {
    import org.apache.spark.sql.functions._
    val rows = Linkage.dFuzzyPrefixBlock.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the enforced Σ|block|² cap: no scored block may exceed BlockCap
    assert(rows.forall(_.getAs[Long]("n_members") <= Linkage.BlockCap))
    rows.foreach { r =>
      val m = r.getAs[Long]("n_members")
      assert(r.getAs[Long]("n_pairs") <= m * (m - 1) / 2)
    }
    // every planted variant with a full-length head differs from its base
    // by exactly one in-block substitution → at least that many pairs
    val planted = core.tbl(spark, sfDir, "documents")
      .filter(col("doc_id") % 9 === 0 && length(col("text")) >= 30)
      .count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum >= planted,
      s"recovered fewer pairs than the $planted planted typo variants")
  }

  test("zorder layout: interleaved buckets are tighter than natural buckets in the non-sort dimension") {
    val rows = Ingest.sZorderLayout.run(spark, sfDir).collect()
    val (z, nat) = rows.partition(_.getAs[String]("layout") == "zorder")
    assert(z.nonEmpty && nat.nonEmpty)
    def avgSpan(rs: Array[org.apache.spark.sql.Row], c: String): Double =
      rs.map(_.getAs[Long](c).toDouble).sum / rs.size
    // natural (orderkey-range) buckets know nothing about partkey, so each
    // spans ~the full partkey range; z-order buckets bound BOTH key ranges
    assert(avgSpan(z, "p_span") * 2 < avgSpan(nat, "p_span"),
      s"zorder p_span ${avgSpan(z, "p_span")} vs natural ${avgSpan(nat, "p_span")}")
  }
}
