package graft

import graft.llm.{Cluster, Curation}
import graft.operators.{Aggregates, Relational}
import graft.sources.Ingest
import org.apache.spark.sql.functions._

/** Invariants for the r8 curation/skew/survivor additions — properties the
  * hash-matching oracle can't express (prefix-ness of the budget rule,
  * shuffle topology of the salted join, survivor-policy divergence from the
  * min-id canonical). */
class CurationSpec extends SparkSpec {

  test("domain filter: every admitted doc comes from a source with keep-rate >= 1/2") {
    val rows = Curation.cDomainFilter.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("src_keep_rate") >= 0.5))
    // admitted docs are a subset of the corpus, never duplicated
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length === ids.length)
  }

  test("token budget: kept set per source is a quality-ranked prefix within 1024 tokens") {
    val rows = Curation.cTokenBudget.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("cum_tokens") <= 1024L))
    // within a source, the running total equals the sum of kept token
    // counts when replayed in (quality DESC, doc_id) order — i.e. the kept
    // set is a clean prefix, nothing was skipped over
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(r => (-r.getAs[Double]("quality"), r.getAs[Long]("doc_id")))
      var cum = 0L
      ordered.foreach { r =>
        cum += r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("cum_tokens") === cum)
      }
    }
  }

  test("subword budget: prefix law holds and spend matches the subword accounting gate") {
    val rows = Curation.cBudgetSubword.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("cum_tokens") <= 2048L))
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(r => (-r.getAs[Double]("quality"), r.getAs[Long]("doc_id")))
      var cum = 0L
      ordered.foreach { r =>
        cum += r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("cum_tokens") === cum)
      }
    }
    // every kept doc is billed at exactly its t_token_subword count
    val acct = graft.llm.TextOps.tTokenSubword.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_subwords")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") === acct(r.getAs[Long]("doc_id")))
    }
  }

  test("overlap matrix: planted recrawl accounts for exactly the doc_id % 6 == 0 docs") {
    val rows = Curation.cOverlapMatrix.run(spark, sfDir).collect()
    val planted = tbl(spark, sfDir, "documents")
      .filter(col("doc_id") % 6 === 0).count()
    // the base corpus has no cross-source verbatim dups, so every overlap
    // pair involves the planted recrawl source ('r' sorts before 'srcN')
    assert(rows.forall(_.getAs[String]("source_a") === "recrawl"))
    assert(rows.map(_.getAs[Long]("n_shared")).sum === planted)
  }

  test("KMV overlap sketch: exact columns reproduce the exact matrix, estimates lawful") {
    val rows = Curation.cOverlapKmv.run(spark, sfDir).collect()
    // 21 sources (20 + planted recrawl) -> 210 unordered pairs, always
    assert(rows.length === 210)
    rows.foreach { r =>
      val (ej, eu) = (r.getAs[Double]("est_jacc"), r.getAs[Double]("est_union"))
      assert(ej >= 0.0 && ej <= 1.0)
      assert(eu > 0.0)
      // ulp-tolerant (round-15 ADVICE): exact equality held only because
      // the projection computed est_inter from the identical column
      // expressions — a plan/expression reorder must not flake the law
      assert(math.abs(r.getAs[Double]("est_inter") - ej * eu) <= 1e-9 * math.max(1.0, ej * eu))
    }
    // cross-gate consistency: the sketch gate's EXACT side is the exact
    // matrix gate, pair for pair (matrix emits only overlapping pairs)
    val matrix = Curation.cOverlapMatrix.run(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("n_shared")).toMap
    rows.foreach { r =>
      val key = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(r.getAs[Long]("exact_inter") === matrix.getOrElse(key, 0L))
    }
    // the planted recrawl pairs carry all the overlap; the sketch must
    // SCREEN them: mean estimated Jaccard over overlapping pairs strictly
    // above the mean over disjoint pairs (the contamination signal)
    val (hot, cold) = rows.partition(_.getAs[Long]("exact_inter") > 0L)
    assert(hot.nonEmpty)
    val mean = (rs: Array[org.apache.spark.sql.Row]) =>
      rs.map(_.getAs[Double]("est_jacc")).sum / rs.length
    assert(mean(hot) > mean(cold),
      s"sketch failed to separate overlapping pairs: ${mean(hot)} vs ${mean(cold)}")
  }

  test("normalize: canonicalization erases planted whitespace noise on every doc") {
    val rows = Curation.cNormalize.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("fp_match")))
    assert(rows.forall(r =>
      r.getAs[Long]("n_chars_norm") <= r.getAs[Long]("n_chars_noisy")))
  }

  test("cumulative users: monotone, and the final total is the distinct-user count") {
    val rows = Aggregates.aCumulativeUsers.run(spark, sfDir).collect()
    val cums = rows.map(_.getAs[Long]("cum_users"))
    assert(cums.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    val totalUsers = core.events(spark, sfDir).select("user_id").distinct().count()
    assert(cums.last === totalUsers)
    assert(rows.map(_.getAs[Long]("n_new_users")).sum === totalUsers)
    assert(rows.forall(r => r.getAs[Long]("n_active") <= r.getAs[Long]("cum_users")))
  }

  test("salted skew join: shuffle topology is pinned and results match the unsalted join") {
    val df = Relational.jSaltedSkewJoin.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"salt demo degenerated to another join strategy:\n$plan")
    val plain = core.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    df.collect().foreach { r =>
      assert(r.getAs[Long]("n_events") === plain(r.getAs[String]("event_type")))
    }
  }

  test("ORC roundtrip: the ORC hop is lossless vs a direct parquet aggregate") {
    val viaOrc = Ingest.sOrcRoundtrip.run(spark, sfDir).collect()
    val direct = tbl(spark, sfDir, "lineitem")
      .filter(col("l_quantity") >= 45)
      .groupBy("l_linestatus").agg(count(lit(1)).as("n_lines"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaOrc.nonEmpty)
    viaOrc.foreach { r =>
      assert(r.getAs[Long]("n_lines") === direct(r.getAs[String]("l_linestatus")))
    }
  }

  test("survivor selection: keep-longest picks v2 on planted chains, one survivor per cluster") {
    val rows = Cluster.ddSurvivor.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (_, members) =>
      assert(members.count(_.getAs[Boolean]("is_survivor")) === 1)
      val surv = members.find(_.getAs[Boolean]("is_survivor")).get
      assert(surv.getAs[Long]("n_toks") === members.map(_.getAs[Long]("n_toks")).max)
    }
    // the longest chain member is v2 (base_id + 200000): keep-longest must
    // pick it, diverging from dedup_cluster's min-id canonical (the base)
    val chainClusters = byCluster.filter(_._2.exists(_.getAs[Long]("doc_id") >= 200000L))
    assert(chainClusters.nonEmpty)
    chainClusters.foreach { case (_, members) =>
      assert(members.find(_.getAs[Boolean]("is_survivor")).get.getAs[Long]("doc_id") >= 200000L)
    }
  }

  test("substring dups: planted prepend-shifted copies are detected near-fully on both sides") {
    val rows = Curation.cSubstringDups.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val copies = rows.filter(_.getAs[Long]("doc_id") >= 600000L)
    assert(copies.nonEmpty)
    copies.foreach { c =>
      // every interior window of a copy matches its base despite the
      // position shift; only the ONE window anchored at the prepended
      // token can miss (it's the only window containing 'zzpre')
      assert(c.getAs[Long]("n_dup_windows") >= c.getAs[Long]("n_windows") - 1,
        s"copy ${c.getAs[Long]("doc_id")} under-detected: $c")
      val base = byId(c.getAs[Long]("doc_id") - 600000L)
      assert(base.getAs[Long]("n_dup_windows") === base.getAs[Long]("n_windows"),
        s"base of ${c.getAs[Long]("doc_id")} not fully covered: $base")
    }
    // share is a valid ratio everywhere
    assert(rows.forall { r =>
      val s = r.getAs[Double]("dup_share"); s >= 0.0 && s <= 1.0
    })
  }

  test("int8 quantization: codes live in [-127,127] and the max-magnitude lane saturates") {
    val rows = llm.Similarity.simQuantizeInt8.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("q_min"), r.getAs[Long]("q_max"))
      assert(lo >= -127L && hi <= 127L)
      // the element at max |x| maps to exactly ±127 by construction
      assert(math.max(math.abs(lo), math.abs(hi)) === 127L)
      assert(r.getAs[Double]("scale_r") > 0.0)
    }
  }

  test("quality logit: verdict is exactly the sign of the logit and both classes occur") {
    val rows = Curation.cQualityLogit.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // rounding to 6dp cannot flip the sign unless the logit is within
      // 5e-7 of zero — flag that pathological weight choice loudly
      val l = r.getAs[Double]("logit_r")
      if (math.abs(l) > 1e-6)
        assert(r.getAs[Boolean]("keep_doc") === (l > 0.0))
    }
    val kept = rows.count(_.getAs[Boolean]("keep_doc"))
    assert(kept > 0 && kept < rows.length, s"degenerate split: $kept/${rows.length}")
  }

  test("dsir weight: masses are consistent integers and the target stratum scores higher") {
    val rows = Curation.cDsirWeight.run(spark, sfDir).collect()
    // one scored row per corpus document (no empty docs in the fixture)
    assert(rows.length === tbl(spark, sfDir, "documents").count())
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length === ids.length)
    rows.foreach { r =>
      val (n, tgt, bg) = (r.getAs[Long]("n_toks"),
        r.getAs[Long]("tgt_mass"), r.getAs[Long]("bg_mass"))
      // target counts are a per-bucket subset of background counts, and a
      // doc's own tokens contribute at least 1 each to its background mass
      assert(n > 0 && bg >= n && tgt >= 0 && tgt <= bg)
      val w = r.getAs[Double]("weight_r")
      assert(w > 0.0 && w <= 1.0)
      assert(math.abs(w - math.rint(tgt.toDouble / bg * 1e6) / 1e6) < 1e-9)
    }
    // the point of the weighting: en docs look more like the en target
    val (en, other) = rows.partition(_.getAs[String]("lang") == "en")
    assert(en.nonEmpty && other.nonEmpty)
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("weight_r")).sum / rs.length
    assert(mean(en) > mean(other),
      s"en mean ${mean(en)} should exceed non-en mean ${mean(other)}")
  }

  test("train split: partitions are exhaustive and roughly 80/10/10") {
    val rows = Curation.cTrainSplit.run(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === core.tbl(spark, sfDir, "documents").count())
    val bySplit = rows.groupBy(_.getAs[String]("split_name"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n_docs")).sum }
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  private def tbl(spark: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    core.tbl(spark, dir, name)
}
