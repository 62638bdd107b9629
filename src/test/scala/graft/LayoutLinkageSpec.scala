package graft

import graft.operators.Linkage
import graft.sources.Ingest
import org.apache.spark.sql.functions.{col, hash, lit, pmod, when}

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

  test("golden-record merge is permutation-invariant and masters its clusters") {
    import org.apache.spark.sql.functions._
    val s2 = spark; import s2.implicits._
    // a contested fixture: two clusters, ties in acctbal and in segment
    // counts, members presented in three different orders/partitionings —
    // every survivorship rule must land on the identical golden set
    val rows = Seq(
      (10L, 13L, "Customer#13", 3, 500.0, "AUTOMOBILE"),
      (10L, 11L, "Customer#11", 1, 900.0, "BUILDING"),
      (10L, 12L, "Customer#12", 2, 900.0, "BUILDING"), // acctbal tie → lower key 11 wins master
      (10L, 14L, "Customer#14", 4, 100.0, "AUTOMOBILE"), // 2×AUTO vs 2×BUILDING → lexicographic
      (20L, 21L, "Customer#21", 5, -10.0, "MACHINERY"),
      (20L, 22L, "Customer#22", 6, -20.0, "MACHINERY"))
    val base = rows.toDF("cluster_id", "c_custkey", "c_name", "c_nationkey",
      "c_acctbal", "c_mktsegment")
    val golden = Linkage.goldenMerge(base).collect().map(_.toString).toSeq
    val reversed = Linkage.goldenMerge(
      rows.reverse.toDF("cluster_id", "c_custkey", "c_name", "c_nationkey",
        "c_acctbal", "c_mktsegment")).collect().map(_.toString).toSeq
    val repartitioned = Linkage.goldenMerge(base.repartition(7))
      .collect().map(_.toString).toSeq
    assert(golden === reversed, "merge depends on member input order")
    assert(golden === repartitioned, "merge depends on partitioning")
    val g10 = Linkage.goldenMerge(base).filter(col("cluster_id") === 10L).head()
    assert(g10.getAs[String]("golden_name") === "Customer#11") // tie → lower key
    assert(g10.getAs[String]("golden_segment") === "AUTOMOBILE") // count tie → lexicographic
    assert(g10.getAs[Double]("golden_acctbal") === 900.0)
    assert(g10.getAs[String]("member_ids") === "11,12,13,14")
    // the full gate: every cluster's master is one of its own members
    val full = Linkage.dEntityGolden.run(spark, sfDir).collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      val members = r.getAs[String]("member_ids").split(",").map(_.toLong)
      assert(members.length === r.getAs[Long]("n_members").toInt)
      val masterKey = r.getAs[String]("golden_name").drop(9).toLong
      assert(members.contains(masterKey), s"master $masterKey outside cluster")
      assert(members.min === r.getAs[Long]("cluster_id"), "canonical is not min member")
    }
  }

  test("incremental entity resolution equals the full rebuild across batch splits") {
    // the er4 property (round-13 queue #4's Done bar): bootstrapping on
    // the old batch, then merging the new batch's pairs through the
    // reduced label graph, must reproduce the full rebuild EXACTLY —
    // same clusters, same min-label canonicals, same golden attributes —
    // for ANY way the customer keys are split into batches
    val full = Linkage.dEntityGolden.run(spark, sfDir).collect()
      .map(_.toString).sorted.toSeq
    val splits = Seq(
      "mod7" -> (col("c_custkey") % 7 === 0),
      "mod3" -> (col("c_custkey") % 3 === 1),
      "hash4" -> (pmod(hash(col("c_custkey")), lit(4)) === 2),
      "low-keys" -> (col("c_custkey") < 100))
    for ((name, pred) <- splits) {
      val inc = Linkage.entityGoldenIncremental(spark, sfDir, pred).collect()
        .map(_.toString).sorted.toSeq
      assert(inc === full, s"incremental diverges from full rebuild on split $name")
    }
    // the merge step FOLDS: a 3-batch sequence (bootstrap + 2 increments)
    // must also land on the full rebuild, for more than one batching
    val seqSplits = Seq(
      "mod3-seq" -> pmod(col("c_custkey"), lit(3)),
      "hash3-seq" -> pmod(hash(col("c_custkey")), lit(3)))
    for ((name, b) <- seqSplits) {
      val seq3 = Linkage.entityGoldenBatched(spark, sfDir, b, 3).collect()
        .map(_.toString).sorted.toSeq
      assert(seq3 === full, s"3-batch fold diverges from full rebuild on $name")
    }
    // out-of-range batch ids would silently drop (or mislabel) rows —
    // the fold fails loudly instead of diverging opaquely from the oracle
    val ex = intercept[IllegalArgumentException] {
      Linkage.entityGoldenBatched(spark, sfDir, pmod(col("c_custkey"), lit(4)), 3)
    }
    assert(ex.getMessage.contains("batch id outside"))
    // a NULL batch id is three-valued-logic-invisible to every range and
    // equality predicate — it must hit the same loud guard, not vanish
    val exNull = intercept[IllegalArgumentException] {
      Linkage.entityGoldenBatched(spark, sfDir,
        when(col("c_custkey") % 5 === 0, lit(null)).otherwise(lit(0)), 3)
    }
    assert(exNull.getMessage.contains("batch id outside"))
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
