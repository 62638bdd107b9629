package graft

import graft.llm.{Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Text-analysis and similarity-search invariants over the sf0.001 corpus —
  * properties the hash-matching oracle can't express (self-retrieval,
  * ANN-vs-exact agreement, score sanity). */
class LlmOpsSpec extends SparkSpec {

  test("token stats: counts are positive and chars/token > 1 on real text") {
    val rows = TextOps.tTokenStats.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_tokens") > 0))
    assert(rows.forall(r => r.getAs[Long]("n_chars_actual") >= r.getAs[Long]("n_tokens")))
    assert(rows.forall(_.getAs[Double]("chars_per_token") > 1.0))
  }

  test("quality score: ratios live in [0,1] / plausible word-length range") {
    val rows = TextOps.tQualityScore.run(spark, sfDir).collect()
    assert(rows.forall { r =>
      val sw = r.getAs[Double]("stopword_ratio"); sw >= 0.0 && sw <= 1.0
    })
    assert(rows.forall(_.getAs[Double]("mean_word_len") > 0.0))
  }

  test("lang-ID: prediction domain and confidence bounds hold") {
    val rows = TextOps.tLangId.run(spark, sfDir).collect()
    val langs = Set("en", "x1", "x2")
    assert(rows.forall(r => langs.contains(r.getAs[String]("predicted_lang"))))
    assert(rows.forall { r =>
      val c = r.getAs[Double]("confidence"); c >= 0.0 && c <= 1.0
    })
  }

  test("fingerprints: identical text ⇒ identical bag fingerprint; fp is content-keyed") {
    val fps = TextOps.tFingerprint.run(spark, sfDir)
      .select("content_fp", "bag_fp").collect()
    assert(fps.forall(r => r.getString(0).length === 32 && r.getString(1).length === 32))
  }

  test("brute-force top-k: the query vector retrieves itself first with score ~1") {
    val top = Similarity.simTopKBrute.run(spark, sfDir).collect()
    assert(top.length === 10)
    assert(top.head.getAs[Long]("vec_id") === 0L) // unit-norm ⇒ self-cosine 1.0
    assert(math.abs(top.head.getAs[Double]("score_r") - 1.0) < 1e-3)
    // scores are non-increasing
    val scores = top.map(_.getAs[Double]("score_r"))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("IVF probe: results come from the query's cell and include the query itself") {
    val rows = Similarity.simIvfProbe.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("cell")).distinct.length === 1) // single-cell probe
    assert(rows.head.getAs[Long]("vec_id") === Similarity.Q1.toLong) // self top-1
  }

  test("IVF multi-probe: ≤3 cells probed, self top-1, recall ≥ single-probe vs exact") {
    val multi = Similarity.simIvfMultiprobe.run(spark, sfDir).collect()
    assert(multi.nonEmpty)
    assert(multi.map(_.getAs[Long]("cell")).distinct.length <= 3)
    assert(multi.head.getAs[Long]("vec_id") === Similarity.Q1.toLong) // self top-1
    // exact top-5 for the same query, brute force — the recall yardstick
    val e = core.tbl(spark, sfDir, "embeddings")
    val q = e.filter(col("vec_id") === Similarity.Q1).select(col("embedding").as("qv"))
    val exact = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        call_function("graft_dot", col("embedding"), col("qv")).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(5)
      .collect().map(_.getLong(0)).toSet
    val single = Similarity.simIvfProbe.run(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val multiTop5 = multi.take(5).map(_.getAs[Long]("vec_id")).toSet
    assert((multiTop5 & exact).size >= (single & exact).size)
  }

  test("PQ encode: codes stay in the codebook, distortion ≥ 0, seeds encode to themselves losslessly") {
    val rows = Similarity.simPqEncode.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (0 until 4).foreach { m =>
        val c = r.getAs[Long](s"code$m"); assert(c >= 0 && c < Similarity.PqK)
      }
      assert(r.getAs[Double]("recon_r") >= 0.0)
    }
    // a codebook seed's nearest codeword in every subspace is itself:
    // exact self-match, zero quantization distortion
    rows.filter(_.getAs[Long]("vec_id") < Similarity.PqK).foreach { r =>
      val id = r.getAs[Long]("vec_id")
      (0 until 4).foreach(m => assert(r.getAs[Long](s"code$m") === id))
      assert(r.getAs[Double]("recon_r") === 0.0)
    }
  }

  test("PQ search: ADC over codes still self-retrieves first, distances non-decreasing") {
    val rows = Similarity.simPqSearch.run(spark, sfDir).collect()
    assert(rows.length === 10)
    assert(rows.head.getAs[Long]("vec_id") === Similarity.Q1.toLong) // self top-1 despite quantization
    val ds = rows.map(_.getAs[Double]("adc_r"))
    assert(ds.forall(_ >= 0.0))
    assert(ds.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
  }

  test("PQ train: every subspace partitions the full corpus and codebook geometry holds") {
    val rows = Similarity.simPqTrain.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = core.tbl(spark, sfDir, "embeddings").count()
    rows.groupBy(_.getAs[Long]("m")).foreach { case (m, rs) =>
      assert(m >= 0 && m < 4)
      // every (code) spans exactly 16 positions with one shared member count
      rs.groupBy(_.getAs[Long]("code")).foreach { case (code, cr) =>
        assert(code >= 0 && code < Similarity.PqK)
        assert(cr.map(_.getAs[Long]("pos")).sorted.toSeq === (0L until 16L))
        assert(cr.map(_.getAs[Long]("n_members")).distinct.length === 1)
      }
      // the subspace's cells partition the corpus: members sum to |corpus|
      val perCode = rs.groupBy(_.getAs[Long]("code"))
        .map(_._2.head.getAs[Long]("n_members")).sum
      assert(perCode === n, s"subspace $m assigns $perCode of $n vectors")
    }
  }

  test("converged PQ book: fixpoint training never loses to the one-round book") {
    // Lloyd monotonicity made measurable (round-12 queue #1's Done bar):
    // each assign+recompute round can only lower total distortion, so the
    // convergence-budgeted book must encode the corpus at least as well
    // as sim_pq_train's single round — and the converged gate's ledger
    // must partition the corpus per subspace like the one-round gate does
    val sub = Similarity.rawSub(spark, sfDir)
    val recs = Similarity.convergedRawBook(spark, sfDir)
    val dConv = Similarity.bookDistortionMicro(spark, sub,
      Similarity.bookDf(spark, recs))
    val dOne = Similarity.bookDistortionMicro(spark, sub,
      Similarity.pqTrainedBook(spark, sfDir))
    val n = core.tbl(spark, sfDir, "embeddings").count()
    // two slop sources per (vec, subspace) row (4n rows total), so the
    // Lloyd monotonicity of the TRUE sums is asserted up to their sum
    // (near-converged seeds could otherwise flip the inequality —
    // round-13 review, widened per the r13 ADVICE flake finding):
    //  (a) floor quantization of the per-row distortion: ≤ 1 micro/row;
    //  (b) the 1e-7 fixed-point centroid displacement δ perturbs a row's
    //      squared distance by ≤ Σ_pos (2·|x_p−c_p|·δ + δ²) — with
    //      unit-norm vectors (coords in [−1,1], |x−c| ≤ 2) and 16
    //      positions per subspace that is ≤ 16·(2·2·1e-7) + 16·1e-14
    //      ≈ 6.4e-6 = 6.4 micro/row; bound it by 9 micro/row.
    assert(dConv <= dOne + 10 * 4 * n,
      s"converged book distortion $dConv exceeds one-round book's $dOne beyond quantization slop")
    recs.groupBy(_._1).foreach { case (m, rs) =>
      assert(rs.map(_._4).sum === n, s"subspace $m inertia ledger incomplete")
      assert(rs.forall(_._5 >= 0L))
    }
  }

  test("learned OPQ allocation: a true permutation that minimizes the balance objective") {
    // the optimizer's contract (round-12 queue #2's Done bar, stated on
    // the objective it optimizes): the greedy allocation must produce a
    // bijection over the 64 dimensions whose per-subspace variance-mass
    // spread beats BOTH fixed audit layouts — identity and the stride-17
    // baseline sim_pq_dim_layout pins.  (Distortion ties within noise on
    // this near-isotropic synthetic corpus — asserted nowhere, measured
    // in the gate; see the simOpqLearned Scaladoc.)
    val varq = Similarity.dimVarianceQ(spark, sfDir)
    val learned = Similarity.opqGreedyPerm(varq)
    assert(learned.sorted === (1 to 64).toSeq, "learned layout is not a permutation")
    val vm = varq.toMap
    def spread(perm: Seq[Int]): Long = {
      val sums = (0 until 4).map(m =>
        (m * 16 until (m + 1) * 16).map(p => vm(perm(p) - 1)).sum)
      sums.max - sums.min
    }
    val sLearned = spread(learned)
    val sIdentity = spread((1 to 64).toSeq)
    val sStride = spread((1 to 64).map(i => ((i * 17 - 17) % 64) + 1))
    assert(sLearned < sIdentity && sLearned < sStride,
      s"learned spread $sLearned does not beat identity $sIdentity / stride17 $sStride")
  }

  test("IVFADC: candidates strictly pruned below corpus size, ≤3 cells, self top-1") {
    // the composed read path must actually PRUNE: candidate volume is the
    // P/K bound that makes IVFADC the billion-scale shape (P=3 of K=8 here)
    val corpus = core.tbl(spark, sfDir, "embeddings").count()
    val cands = Similarity.ivfAdcCandidates(spark, sfDir).count()
    assert(cands < corpus,
      s"IVFADC scanned $cands of $corpus vectors — no pruning happened")
    assert(cands > 0)
    val rows = Similarity.simIvfAdc.run(spark, sfDir).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Long]("cell")).distinct.length <= 3) // ≤ P cells
    assert(rows.head.getAs[Long]("vec_id") === Similarity.Q1.toLong) // self top-1 on trained book
    // ADC distances non-decreasing down the ranking
    val ds = rows.map(_.getAs[Double]("adc_r"))
    assert(ds.forall(_ >= 0.0))
    assert(ds.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
  }

  test("residual IVFADC: ≤3 probed cells, non-negative non-decreasing ADC ranking") {
    val rows = Similarity.simIvfAdcResidual.run(spark, sfDir).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Long]("cell")).distinct.length <= 3) // ≤ P cells
    val ds = rows.map(_.getAs[Double]("adc_r"))
    assert(ds.forall(_ >= 0.0))
    assert(ds.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
  }

  test("ANN recall ladder: probe3 recovers at least probe1's hits; self always found") {
    val byMethod = Similarity.simAnnRecall.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("method") -> r.getAs[Long]("hits")).toMap
    assert(byMethod.keySet === Set("ivf_probe1", "ivf_probe3", "pq_adc"))
    // more probes can only widen the candidate set → recall is monotone
    assert(byMethod("ivf_probe3") >= byMethod("ivf_probe1"))
    // the query's own cell holds the query, and dot(q, q) is the max score
    assert(byMethod("ivf_probe1") >= 1L)
    assert(byMethod.values.forall(h => h >= 0L && h <= 10L))
  }

  test("recall-set harness: per-set structure holds; raw-vs-residual is measured, not assumed") {
    // the query-SET harness (round-12 queue #3): 8 held-out queries, four
    // rungs including both composed IVFADC read paths on IDENTICAL
    // candidates.  Only corpus-independent structure is asserted — the
    // raw/residual ordering is the harness's OUTPUT (on this isotropic
    // corpus residual measurably loses; see the gate's Scaladoc)
    val rows = Similarity.simAnnRecallSet.run(spark, sfDir).collect()
    val byMethod = rows.map(r => r.getAs[String]("method") -> r.getAs[Long]("hits")).toMap
    assert(byMethod.keySet ===
      Set("ivf_probe1", "ivf_probe3", "ivfadc_raw", "ivfadc_rerank", "ivfadc_residual"))
    assert(rows.forall(r => r.getAs[Long]("n_queries") === 8L && r.getAs[Long]("k") === 10L))
    // widening the probe set can only add candidates → monotone recall
    assert(byMethod("ivf_probe3") >= byMethod("ivf_probe1"))
    // every query's own cell holds the query itself → at least 8 hits
    assert(byMethod("ivf_probe1") >= 8L)
    // both ADC rungs rank real candidates: 0 < hits <= k * |Q|
    assert(byMethod("ivfadc_raw") >= 1L)
    // the structural two-stage law: the exact re-rank of a beam that
    // CONTAINS the ADC top-10 can never lose recall to the ADC ranking
    assert(byMethod("ivfadc_rerank") >= byMethod("ivfadc_raw"))
    assert(byMethod.values.forall(h => h >= 0L && h <= 80L))
  }

  test("ADC re-rank: beam recall dominates the pure ADC ranking, scores agree with exact") {
    // the structural law of two-stage retrieval: the re-ranked top-10 is
    // the TRUE-score optimum of a beam that CONTAINS the ADC top-10, so
    // every exact-top-10 member the ADC rung finds, the re-rank keeps —
    // recall@10(rerank) >= recall@10(adc), by construction, not luck
    val s2 = spark; import s2.implicits._
    val q = core.tbl(spark, sfDir, "embeddings").filter(col("vec_id") === Similarity.Q1)
      .select(col("embedding").as("qv"))
    val exact = core.tbl(spark, sfDir, "embeddings").crossJoin(broadcast(q))
      .select(col("vec_id"),
        call_function("graft_dot", col("embedding"), col("qv")).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val adcTop = Similarity.simIvfAdc.run(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val rerank = Similarity.simAdcRerank.run(spark, sfDir).collect()
    val rerankTop = rerank.map(_.getAs[Long]("vec_id")).toSet
    assert(rerankTop.size === 10 && adcTop.size === 10)
    assert((rerankTop & exact).size >= (adcTop & exact).size,
      s"re-rank recall ${(rerankTop & exact).size} below ADC's ${(adcTop & exact).size}")
    // the query retrieves itself first under exact re-scoring
    assert(rerank.head.getAs[Long]("vec_id") === Similarity.Q1.toLong)
    assert(rerank.head.getAs[Double]("score_r") > 0.999)
    // exact scores are presented in descending order
    val ss = rerank.map(_.getAs[Double]("score_r")).toSeq
    assert(ss === ss.sorted.reverse)
  }

  test("learned OPQ rotation beats the permutation-only book on the planted-covariance fixture") {
    // the round-13 queue #2 Done bar: on a covariance-structured fixture
    // the trained book under the LEARNED ROTATION must strictly beat the
    // permutation-only (greedy-allocation) book — a permutation can only
    // relocate correlated dimensions, the rotation collapses them
    val rows = Similarity.simOpqRotation.run(spark, sfDir).collect()
    val by = rows.map(r => r.getAs[String]("variant") -> r.getAs[Long]("total_micro")).toMap
    assert(by.keySet === Set("identity", "permuted", "rotated"))
    assert(by("rotated") < by("permuted"),
      s"rotated ${by("rotated")} not below permutation-only ${by("permuted")}")
    assert(by("permuted") < by("identity"),
      s"allocation ${by("permuted")} not below identity ${by("identity")}")
    // unit laws of the integer Jacobi: a diagonal matrix is already
    // optimal — zero iterations, R = identity at scale 1e6
    val diag = Array.tabulate(4096)(k => if (k / 64 == k % 64) 123456L else 0L)
    val (r0, it0) = Similarity.opqJacobi(diag)
    assert(it0 === 0)
    assert(r0.toSeq === Seq.tabulate(4096)(k => if (k / 64 == k % 64) 1000000L else 0L))
  }

  test("codebook size lever: recall and trained distortion improve with k* on this corpus") {
    // the deployment lesson sim_ann_frontier's doc names, asserted on the
    // fixture: growing the per-subspace codebook (3 -> 5 -> 6 bits) must
    // improve both the trained encode distortion and the beam-200
    // recall@10 of the full-corpus ADC ranking (the gate already enforces
    // the structural laws: seed monotonicity, trained <= seed + slop)
    val rows = Similarity.simPqCodebookSize.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("k_codes")).toSeq === Seq(8L, 32L, 64L))
    val trained = rows.map(_.getAs[Long]("trained_micro")).toSeq
    assert(trained === trained.sorted.reverse, s"trained distortion not improving: $trained")
    // recall: every larger book must beat the 3-bit baseline; the 32→64
    // step is NOT asserted (at sf0.001 recall saturates near 1.0 and the
    // last step can wobble by a hit or two — measured, not lawful)
    val hits = rows.map(_.getAs[Long]("hits_b200")).toSeq
    assert(hits(1) > hits(0) && hits(2) > hits(0),
      s"larger codebooks do not beat the 3-bit baseline: $hits")
  }

  test("IVF cell-count lever: trained-32 dominates the served 8-cell layout at matched scan fractions") {
    val rows = Similarity.simIvfCells.run(spark, sfDir).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") >= 0L && r.getAs[Long]("hits") <= 80L)
      assert(r.getAs[Long]("scanned") > 0L)
    }
    val by = rows.map(r => (r.getAs[String]("variant"), r.getAs[Long]("probes")) ->
      r.getAs[Long]("hits")).toMap
    // matched scan fractions (1/8 and 3/8 of the corpus): the trained
    // 32-cell quantizer's exact ceiling beats the served seeded-8 layout
    // by a wide margin (measured 70 vs 29 hits at n=500, 67 vs 30 at
    // n=2000 for the 1/8 point; 75 vs 54 / 75 vs 52 at 3/8) — the
    // in-gate require already enforces probe monotonicity per quantizer
    assert(by(("k32_trained", 4L)) > by(("k8_seeded", 1L)) + 16,
      s"k32 at the 1/8 fraction did not dominate the served layout: $by")
    assert(by(("k32_trained", 12L)) > by(("k8_seeded", 3L)) + 8,
      s"k32 at the 3/8 fraction did not dominate the served layout: $by")
  }

  test("deployed read path: composed adopted levers clear the recall bar the seeded layout never could") {
    val rows = Similarity.simAnnDeployed.run(spark, sfDir).collect()
    assert(rows.length === 8, "one row per held-out query")
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") >= 0L && r.getAs[Long]("hits") <= 10L)
      // the in-gate require already pins beam ⊆ pool and the floor rule
      assert(r.getAs[Long]("beam_rows") <= r.getAs[Long]("pool_rows"))
    }
    // measured with the round-17 HONEST query window (disjoint from
    // every codebook seed range — the old 16..23 window inflated these):
    // 47/80 at sf0.001, 36/80 at sf0.01, 34/80 at sf0.1 — each EXACTLY
    // its probe-4 pool ceiling (the x2 beam buys back the whole ADC
    // ranking error). Bar at 30 (0.375) flags a real collapse while
    // leaving room for tie-level wobble across corpus regenerations
    val total = rows.map(_.getAs[Long]("hits")).sum
    assert(total >= 30L, s"deployed path recall fell below the bar: $total/80")
  }

  test("deployed levers: every coding's x2 beam reads the pool ceiling; codings tie at x1") {
    val rows = Similarity.simDeployedLevers.run(spark, sfDir).collect()
    assert(rows.length === 7)
    val by = rows.map(r => r.getAs[String]("variant") ->
      (r.getAs[Long]("beam_rows"), r.getAs[Long]("hits"))).toMap
    val ceil = by("ceiling")._2
    // structural (also required in-gate): nested beams hit-monotone PER
    // CODING, ceiling caps every rung, matched x1 widths identical
    for (c <- Seq("raw", "res", "opqres")) {
      assert(by(s"${c}_m1")._2 <= by(s"${c}_m2")._2)
      assert(by(s"${c}_m2")._2 <= ceil)
    }
    assert(by("raw_m1")._1 === by("res_m1")._1 &&
      by("raw_m1")._1 === by("opqres_m1")._1)
    // measured at every driver corpus under the honest window: the x2
    // beam reads the pool ceiling under EVERY coding (47/36/34 = ceiling
    // at sf0.001/0.01/0.1) — asserted with 1-hit slack so a regenerated
    // corpus flags only a real gap, not a tie flip. The x1 codings
    // differ by at most 2 hits (noise), so no coding-ordering claim is
    // asserted — the r16 residual-wins result did not survive the
    // honest window, and the OPQ composition ties (near-isotropic
    // residuals give the allocation nothing to exploit)
    for (c <- Seq("raw", "res", "opqres"))
      assert(by(s"${c}_m2")._2 >= ceil - 1L,
        s"the x2 beam stopped reading the pool ceiling for $c: ${by(s"${c}_m2")._2} vs $ceil")
  }

  test("dim truncation: exact corner holds and recall rises with kept dims") {
    val rows = Similarity.simDimTruncation.run(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("dim_d"))
    assert(rows.map(_.getAs[Long]("dim_d")).toSeq === Seq(8L, 16L, 32L, 64L))
    // structural corner (also required in-gate): D=64 IS the exact ranking
    assert(rows.last.getAs[Long]("hits") === 80L)
    // measured shape: rising overall (0.225/0.2125/0.4125/1.0 at
    // sf0.001 under the honest query window) but NOT mathematically
    // monotone — truncated rankings aren't nested, and on near-isotropic
    // data adjacent D rungs can wobble by a tie-level hit (D=8 18 vs
    // D=16 17 at sf0.001) — so 1-hit slack flags only a real collapse
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hits") <= b.getAs[Long]("hits") + 1L,
        s"recall fell from D=${a.getAs[Long]("dim_d")} to D=${b.getAs[Long]("dim_d")}")
    }
    // the lever's verdict on THIS corpus: near-isotropic embeddings give
    // prefix truncation no energy compaction — D=8 (32 bytes/vec) stays
    // far below the served 3-byte PQ book's 0.84 beam-200 recall
    assert(rows.head.getAs[Long]("hits") < 40L,
      "D=8 truncation unexpectedly strong - re-measure the PQ comparison in the scaladoc")
    // endpoint pin (r17 advice: per-rung slack alone would let recall
    // decline 3 hits across the whole ladder): the overall rise is
    // strict from D=8 to D=32, independent of adjacent-rung wobble
    assert(rows(2).getAs[Long]("hits") > rows.head.getAs[Long]("hits"),
      "recall at D=32 must sit strictly above D=8 - the ladder's rise collapsed")
  }

  test("residual book memo: distinct coarse inputs return distinct books") {
    // r17 advice regression: the old fixed 'res32' memo key ignored the
    // cents/assign parameters, so a second caller passing a DIFFERENT
    // coarse layout would silently receive the first caller's trained
    // book; coarseTag now names the coarse pair inside the memo key
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    def coarsePair(lo: Int): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
      val cents = e.filter(col("vec_id") >= lo && col("vec_id") < lo + 8)
        .select((col("vec_id") - lo).as("cent_id"), col("embedding").as("cv"))
      val packed = cents.groupBy().agg(
        collect_list(struct(col("cent_id"), col("cv"))).as("cs"))
      val best = array_max(transform(col("cs"), c => struct(
        (call_function("graft_dot", col("embedding"), c("cv"))
          - lit(1e-12) * c("cent_id")).as("score"),
        c("cent_id").as("cent_id"))))
      val assign = e.crossJoin(broadcast(packed))
        .select(col("vec_id"), best("cent_id").as("cell"))
      (cents, assign)
    }
    val (cA, aA) = coarsePair(0)
    val (cB, aB) = coarsePair(100)
    val bookA = Similarity.convergedRes32Book(spark, sfDir, cA, aA, coarseTag = "specA")
    val bookB = Similarity.convergedRes32Book(spark, sfDir, cB, aB, coarseTag = "specB")
    assert(bookA != bookB,
      "residual books trained against distinct coarse layouts must differ - the memo key collapsed them")
    // and the memo is a hit on the same (tag, corpus): identical value back
    val bookA2 = Similarity.convergedRes32Book(spark, sfDir, cA, aA, coarseTag = "specA")
    assert(bookA2 == bookA)
  }

  test("index policy: frontier is priced lawfully and consolidation recovers the streamed tax") {
    val rows = Similarity.simIndexPolicy.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("variant")).toSeq ===
      Seq("p10_consolidate_each", "p20_consolidate_end", "p30_fold_only", "rebuilt"))
    val by = rows.map(r => r.getAs[String]("variant") ->
      (r.getAs[Long]("rounds_cost"), r.getAs[Long]("hits"), r.getAs[Long]("total"))).toMap
    // the frontier's cost axis: fold-only < consolidate-at-end <
    // consolidate-each < full rebuild, and the trigger/consolidation
    // columns carry the integer rule's schedule (also required in-gate)
    assert(by("p30_fold_only")._1 < by("p20_consolidate_end")._1)
    assert(by("p20_consolidate_end")._1 < by("p10_consolidate_each")._1)
    assert(by("p10_consolidate_each")._1 < by("rebuilt")._1)
    // measured at sf0.001: one end-consolidation recovers the bulk of the
    // per-batch fold's recall tax (4639 -> 4959 of 5000) — assert a real
    // margin, not the in-gate weak inequality
    assert(by("p20_consolidate_end")._2 > by("p30_fold_only")._2 + 100L,
      s"end consolidation no longer recovers the streamed tax: ${by("p20_consolidate_end")._2} vs ${by("p30_fold_only")._2}")
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_r")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("graph centrality: ranked ledger is lawful and central mass tracks dense regions") {
    val rows = Similarity.simGraphCentrality.run(spark, sfDir).collect()
    assert(rows.length === 50)
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (1L to 50L))
    // ranks follow (mass desc, vec_id) with no ties mis-ordered
    rows.sliding(2).foreach { case Array(a, b) =>
      val (ma, mb) = (a.getAs[Long]("mass_micro"), b.getAs[Long]("mass_micro"))
      assert(ma > mb || (ma == mb && a.getAs[Long]("vec_id") < b.getAs[Long]("vec_id")))
    }
    // the in-gate require already pins conservation and the 150000 floor;
    // here: the selection SIGNAL — top-50 mean in-degree well above the
    // serve graph's mean of exactly NndServeDeg = 10 (measured 15.6 at
    // sf0.01, 17.2 at sf0.1)
    val meanInDeg = rows.map(_.getAs[Long]("in_deg")).sum.toDouble / rows.length
    assert(meanInDeg > 12.0,
      s"top-50 mean in-degree $meanInDeg did not separate from the graph mean 10")
  }

  test("derived re-rank beam: subset of the pool, floor/k respected, monotone in pool size") {
    // the sizing rule's contract (round-13 queue #7): beam ⊆ candidates
    // by construction (min clamp), never below min(pool, floor), grows
    // monotonically and logarithmically with the pool
    import Similarity.{rerankBeamWidth, RerankBeamFloor, RerankK}
    val pools = Seq(1L, 10L, 31L, 32L, 50L, 200L, 1875L, 1L << 20, 1L << 40)
    for (c <- pools) {
      val b = rerankBeamWidth(c)
      assert(b <= c, s"beam $b exceeds pool $c")
      assert(b >= math.min(c, RerankBeamFloor.toLong), s"beam $b under floor at pool $c")
      assert(b >= math.min(c, RerankK.toLong), s"beam $b cannot hold top-k at pool $c")
    }
    assert(pools.map(rerankBeamWidth) === pools.map(rerankBeamWidth).sorted)
    // spot values of the documented rule min(C, max(50, 10·bitlen(C)))
    assert(rerankBeamWidth(1875L) === 110)  // bitlen 11
    assert(rerankBeamWidth(200L) === 80)    // bitlen 8
    assert(rerankBeamWidth(10L) === 10)     // clamped to the pool
  }

  test("hot-cell split: children partition the hot cell and the max share strictly drops") {
    // the index-maintenance contract: the split must conserve membership
    // (children sum to the hot cell, corpus total unchanged), produce two
    // real sub-cells, and actually fix the hotness it was triggered by
    val before = Similarity.simIvfLayout.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("cell").toString -> r.getAs[Long]("n_vectors")).toMap
    val after = Similarity.simIvfSplit.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("cell_label") -> r.getAs[Long]("n_vectors")).toMap
    val hot = before.maxBy { case (c, n) => (n, -c.toLong) }._1
    assert(after.keySet === before.keySet - hot + s"${hot}a" + s"${hot}b")
    assert(after(s"${hot}a") > 0 && after(s"${hot}b") > 0, "degenerate split")
    assert(after(s"${hot}a") + after(s"${hot}b") === before(hot), "membership not conserved")
    (before.keySet - hot).foreach(c => assert(after(c) === before(c), s"cell $c touched"))
    assert(after.values.max < before.values.max,
      s"split did not reduce the max cell (${after.values.max} vs ${before.values.max})")
  }

  test("semantic dedup drops exactly the planted near-copies, each kept by its source") {
    val rows = Similarity.simSemanticDedup.run(spark, sfDir).collect()
    val planted = core.tbl(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 5 === 1).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.nonEmpty)
    // removed set == the planted ids (+500000), nothing natural swept up
    assert(rows.map(_.getAs[Long]("dup_id")).toSet === planted.map(_ + 500000L))
    // every near-copy's keeper is its own source, not some other neighbor
    assert(rows.forall(r => r.getAs[Long]("keeper_id") === r.getAs[Long]("dup_id") - 500000L))
    // "semantic": close but NOT bit-identical — cosine strictly inside (0.95, 1]
    assert(rows.forall { r =>
      val s = r.getAs[Double]("score_r"); s > 0.95 && s <= 1.0
    })
  }

  test("embedding-cosine dedup maps every planted copy to its exact original") {
    val mapping = Similarity.ddEmbeddingCosine.run(spark, sfDir)
      .collect().map(r => r.getAs[Long]("dup_id") -> r.getAs[Long]("canonical_id"))
    assert(mapping.nonEmpty)
    assert(mapping.forall { case (dup, canon) => dup === canon + 200000L })
  }

  test("line dedup keeps first occurrences in order and drops natural + planted repeats") {
    import SparkSpec.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_linededup").toString
    // 17 tokens → lines [A A x] with A = the repeated 8-token chunk; the
    // gate plants line 1 again → input [A A x A]: 4 lines, 2 distinct
    val a = "w1 w2 w3 w4 w5 w6 w7 w8"
    Seq((1L, s"$a $a x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextOps.tLineDedup.run(spark, dir).collect().head
    assert(r.getAs[Long]("n_lines") === 4L)
    assert(r.getAs[Long]("n_uniq") === 2L)
    assert(r.getAs[String]("clean_text") === s"$a\nx")
  }

  test("corpus boilerplate removal drops exactly the planted cross-doc lines") {
    val out = TextOps.tBoilerplateCorpus.run(spark, sfDir).collect()
    assert(out.length === 500)
    // every document loses its universal header; doc_id % 3 == 0 also
    // loses the partial second header; nothing natural crosses 5% df
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val dropped = r.getAs[Long]("n_lines") - r.getAs[Long]("n_kept")
      assert(dropped === (if (id % 3 == 0) 2L else 1L), s"doc $id")
      assert(!r.getAs[String]("clean_text").contains("graft corpus boiler"), s"doc $id")
    }
    // surviving lines keep original order: clean_text re-chunks to the
    // document's own token stream (header sits in its own aligned chunk)
    val doc1 = out.find(_.getAs[Long]("doc_id") == 1L).get
    val orig = core.tbl(spark, sfDir, "documents")
      .filter(col("doc_id") === 1L).head().getAs[String]("text")
    assert(doc1.getAs[String]("clean_text").replace("\n", " ") === orig)
  }

  test("corpus filter funnel matches an independent driver-side model exactly") {
    import SparkSpec.spark.implicits._
    val row = TextOps.tCorpusFilter.run(spark, sfDir).head()
    // replay the funnel in plain Scala over the collected corpus (500 docs
    // + planted copies — trivially driver-sized at spec scale)
    val docs = core.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val src = docs ++ docs.filter(_._1 % 7 == 0).map { case (id, tx) => (id + 200000L, tx) }
    val en = Set("the", "a", "query", "table")
    val x1 = Set("data", "fast", "batch")
    val x2 = Set("spark", "merge", "window")
    case class F(id: Long, text: String, lang: Boolean, len: Boolean, qual: Boolean)
    val fs = src.map { case (id, tx) =>
      val t = tx.split("\\s+")
      val (e, h1, h2) = (t.count(en), t.count(x1), t.count(x2))
      val mwl = tx.replace(" ", "").length.toDouble / t.length
      F(id, tx, e >= h1 && e >= h2, t.length >= 20 && t.length <= 1000,
        mwl >= 2.0 && mwl <= 12.0)
    }
    val passed = fs.filter(f => f.lang && f.len && f.qual)
    val minByText = passed.groupBy(_.text).map { case (tx, l) => tx -> l.map(_.id).min }
    val kept = passed.filter(f => minByText(f.text) == f.id)
    assert(row.getAs[Long]("n_docs") === src.length.toLong)
    assert(row.getAs[Long]("drop_lang") === fs.count(!_.lang).toLong)
    assert(row.getAs[Long]("drop_length") === fs.count(f => f.lang && !f.len).toLong)
    assert(row.getAs[Long]("drop_quality") === fs.count(f => f.lang && f.len && !f.qual).toLong)
    assert(row.getAs[Long]("drop_dup") === (passed.length - kept.length).toLong)
    assert(row.getAs[Long]("n_kept") === kept.length.toLong)
    assert(row.getAs[Double]("kept_sum") === kept.map(_.id).sum.toDouble)
    assert(row.getAs[Double]("kept_sumsq") === kept.map(f => f.id * f.id).sum.toDouble)
    // the funnel actually exercised every stage boundary we care about
    assert(row.getAs[Long]("drop_dup") > 0 && row.getAs[Long]("n_kept") > 0)
  }

  test("sequence packing lays out each shard contiguously with exact block spans") {
    import SparkSpec.spark.implicits._
    val rows = TextOps.tPackSequences.run(spark, sfDir)
      .select("doc_id", "shard", "n_tokens", "tok_start", "first_block", "last_block", "block_offset")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 500)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val inOrder = docs.sortBy(_._1)
      // contiguous concat layout: each doc starts where the previous ended
      inOrder.foldLeft(0L) { case (expectedStart, (id, _, n, start, fb, lb, off)) =>
        assert(start === expectedStart, s"doc $id")
        assert(fb === start / 512 && lb === (start + n - 1) / 512 && off === start % 512)
        start + n
      }
    }
  }

  test("subword packing: same layout law, counts agree with the subword accounting gate") {
    import SparkSpec.spark.implicits._
    val rows = TextOps.tPackSubword.run(spark, sfDir)
      .select("doc_id", "shard", "n_tokens", "tok_start", "first_block", "last_block", "block_offset")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 500)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      docs.sortBy(_._1).foldLeft(0L) { case (expectedStart, (id, _, n, start, fb, lb, off)) =>
        assert(start === expectedStart, s"doc $id")
        assert(fb === start / 512 && lb === (start + n - 1) / 512 && off === start % 512)
        start + n
      }
    }
    // the packer spends the SAME per-doc token count t_token_subword reports
    val acct = TextOps.tTokenSubword.run(spark, sfDir)
      .select("doc_id", "n_subwords").as[(Long, Long)].collect().toMap
    rows.foreach { case (id, _, n, _, _, _, _) => assert(n === acct(id), s"doc $id") }
    // fertility > 1 on real text: subword layout is strictly longer
    val wsTotal = TextOps.tPackSequences.run(spark, sfDir)
      .agg(sum("n_tokens")).as[Long].head()
    assert(rows.map(_._3).sum > wsTotal)
  }

  test("native graft_subwords equals the reference column fold on corpus and edges") {
    import SparkSpec.spark.implicits._
    val corpus = core.tbl(spark, sfDir, "documents").select(col("text"))
    val edges = Seq("", "   ", "\t\n x", "the theology", "tionmenttion",
      "héllo wörld", "a b", "𝔘𝔫𝔦 ok",
      "MiXeD CaSe THE", "ab  cd\r\nef", "xy\fz").toDF("text")
    val diff = corpus.unionAll(edges)
      .select(TextOps.docSubwords(col("text")).as("native"),
        TextOps.docSubwordsFold(col("text")).as("fold"))
      .filter(not(col("native") <=> col("fold")))
      .count()
    assert(diff === 0L)
  }

  test("temperature mixture keeps the smallest domain whole and flattens the rest") {
    val rows = TextOps.tMixtureSample.run(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_total"),
        r.getAs[Long]("threshold_k"), r.getAs[Long]("n_kept")))
    assert(rows.length >= 2)
    val nMin = rows.map(_._2).min
    rows.foreach { case (lang, nTot, k, nKept) =>
      assert(nKept <= nTot, lang)
      if (nTot == nMin) assert(k === 4096L && nKept === nTot, s"$lang must keep all")
      else {
        // realized rate tracks the α=0.5 target within hash variance
        val target = math.sqrt(nMin.toDouble / nTot)
        assert(math.abs(nKept.toDouble / nTot - target) < 0.15, s"$lang rate")
      }
    }
  }

  test("repetition stats: dup-line fraction and top-bigram share on a crafted doc") {
    import SparkSpec.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_repstats").toString
    // 17 tokens: lines [w1..w8, w1..w8, "x"] → 3 lines, 2 distinct;
    // bigrams: w1w2..w7w8 twice each (14), w8w1 and w8x once → top 2/16
    val a = (1 to 8).map(i => s"w$i").mkString(" ")
    Seq((1L, s"$a $a x")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextOps.tRepetitionStats.run(spark, dir).head()
    assert(r.getAs[Long]("n_lines") === 3L)
    assert(r.getAs[Long]("n_uniq_lines") === 2L)
    assert(math.abs(r.getAs[Double]("dup_line_frac") - 1.0 / 3) < 1e-12)
    assert(r.getAs[Long]("n_bigrams") === 16L)
    assert(math.abs(r.getAs[Double]("top_bigram_share") - 0.125) < 1e-12)
  }

  test("salient terms: dense ranks, exact tf/df scores, non-increasing per doc") {
    val rows = TextOps.tSalientTerms.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("term_rank"))
      assert(sorted.map(_.getAs[Long]("term_rank")).toSeq === (1L to sorted.length.toLong))
      sorted.foreach { r =>
        assert(r.getAs[Double]("score") ===
          r.getAs[Long]("tf").toDouble / r.getAs[Long]("df"))
      }
      val scores = sorted.map(_.getAs[Double]("score")).toSeq
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("chunk windows cover every token with the declared size/stride/overlap") {
    import SparkSpec.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_chunks").toString
    val tokens = (1 to 50).map(i => s"w$i")
    Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.tChunkWindows.run(spark, dir)
      .select("win_id", "tok_start", "win_len", "chunk_fp")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // 50 tokens, size 32, stride 24 → windows at 0 (len 32) and 24 (len 26)
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq === Seq((0L, 0L, 32L), (1L, 24L, 26L)))
    // fingerprints hash exactly the declared token spans
    rows.foreach { case (_, start, len, fp) =>
      val expected = java.security.MessageDigest.getInstance("MD5")
        .digest(tokens.slice(start.toInt, (start + len).toInt).mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(fp === expected)
    }
  }

  test("PII redaction masks every category and counts per-category occurrences") {
    val out = TextOps.tPiiRedact.run(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("c_custkey")
      val red = r.getAs[String]("redacted_note")
      assert(r.getAs[Long]("n_email") === (if (id % 5 == 0) 0L else 1L), s"cust $id")
      assert(r.getAs[Long]("n_phone") === (if (id % 3 == 0) 2L else 1L), s"cust $id")
      assert(r.getAs[Long]("n_id") === 1L, s"cust $id")
      // nothing sensitive survives: no address-sign, no phone shape, no acct id
      assert(!red.contains("@") && !red.contains("ACCT-"), s"cust $id: $red")
      assert(!"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}".r.findFirstIn(red).isDefined, s"cust $id")
      assert(red.contains("[PHONE]"), s"cust $id")
    }
  }

  test("decontamination flags every planted contaminated doc against its eval source") {
    val flagged = TextOps.tDecontaminate.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shared_ngrams"), r.getAs[Long]("n_eval_docs"))).toMap
    val evalIds = SparkSpec.spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 50 === 0 && size(split(col("text"), "\\s+")) >= 8)
      .select("doc_id").collect().map(_.getLong(0))
    assert(evalIds.nonEmpty)
    evalIds.foreach { e =>
      val p = flagged.get(e + 300000L)
      assert(p.isDefined, s"planted contaminated doc ${e + 300000L} not flagged")
      assert(p.get._1 >= 1L && p.get._2 >= 1L)
    }
  }

  test("inverted postings: df ordering, bounded ascending previews, exact counts on a planted term") {
    val rows = TextOps.tInvertedPostings.run(spark, sfDir).collect()
    val corpus = SparkSpec.spark.read.parquet(s"$sfDir/documents.parquet")
    val vocab = corpus.select(explode(split(col("text"), "\\s+")).as("t"))
      .select("t").distinct().count()
    assert(rows.length === math.min(50L, vocab).toInt)
    val nDocs = corpus.count()
    // top-k order is (df DESC, term ASC), df bounded by the corpus size
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (dfA, dfB) = (a.getAs[Long]("df"), b.getAs[Long]("df"))
        assert(dfA > dfB || (dfA == dfB &&
          a.getAs[String]("term") < b.getAs[String]("term")))
      case _ =>
    }
    rows.foreach { r =>
      val (df, tf) = (r.getAs[Long]("df"), r.getAs[Long]("tf_total"))
      assert(df >= 1 && df <= nDocs && tf >= df)
      // preview: min(df, 8) strictly-ascending doc ids
      val docs = r.getAs[String]("top_docs").split(",").map(_.toLong)
      assert(docs.length === math.min(df, 8L).toInt)
      assert(docs.sliding(2).forall { case Array(x, y) => x < y; case _ => true })
    }
    // cross-check one term end-to-end against a direct count
    val probe = rows.head.getAs[String]("term")
    val direct = SparkSpec.spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("t"))
      .filter(col("t") === probe)
    assert(rows.head.getAs[Long]("tf_total") === direct.count())
    assert(rows.head.getAs[Long]("df") === direct.select("doc_id").distinct().count())
  }

  test("bm25 rank: ordered top-k, hit counts bounded by the query, saturation ceiling holds") {
    val rows = TextOps.tBm25Rank.run(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (sa, sb) = (a.getAs[Long]("score_fp"), b.getAs[Long]("score_fp"))
        assert(sa > sb || (sa == sb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
      case _ =>
    }
    rows.foreach { r =>
      val n = r.getAs[Long]("n_hit")
      assert(n >= 1 && n <= 5, "a doc can match at most the 5 query terms")
      assert(r.getAs[Long]("score_fp") > 0L)
      assert(math.abs(r.getAs[Double]("score_r") -
        math.rint(r.getAs[Long]("score_fp").toDouble / 1e6 * 1e6) / 1e6) < 1e-9)
    }
    // saturation curve < k1+1 = 2.2 per term, so score < Σ_query idf·2.2;
    // recompute the query's (term, df) directly to bound the top score
    val corpus = SparkSpec.spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = corpus.count().toDouble
    val dfTop = corpus.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("t"))
      .distinct().groupBy("t").count()
      .orderBy(col("count").desc, col("t")).limit(5)
      .collect().map(_.getAs[Long]("count"))
    val ceiling = dfTop.map(df => (nDocs - df + 0.5) / (df + 0.5) * 2.2).sum * 1e6
    assert(rows.head.getAs[Long]("score_fp") < ceiling)
  }

  test("tokenizer eval: per-lang rows cross-foot with the per-doc accounting gate") {
    val rows = TextOps.tTokenizerEval.run(spark, sfDir).collect()
    val corpus = SparkSpec.spark.read.parquet(s"$sfDir/documents.parquet")
    assert(rows.map(_.getAs[String]("lang")).toSet ===
      corpus.select("lang").distinct().collect().map(_.getString(0)).toSet)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === corpus.count())
    rows.foreach { r =>
      // a subword never exceeds its word, a word never exceeds its chars
      assert(r.getAs[Double]("fertility_r") >= 1.0)
      assert(r.getAs[Double]("chars_per_subword_r") >= 1.0)
      assert(r.getAs[Long]("n_subwords") >= r.getAs[Long]("n_words"))
    }
    // the evaluation bills with the SAME kernel the accounting gate reports
    val perDoc = TextOps.tTokenSubword.run(spark, sfDir)
      .agg(sum("n_subwords"), sum("n_words")).head()
    assert(rows.map(_.getAs[Long]("n_subwords")).sum === perDoc.getLong(0))
    assert(rows.map(_.getAs[Long]("n_words")).sum === perDoc.getLong(1))
  }

  test("length buckets: exhaustive population, exact waste arithmetic, caps honored") {
    val rows = TextOps.tLengthBuckets.run(spark, sfDir).collect()
    val corpus = SparkSpec.spark.read.parquet(s"$sfDir/documents.parquet")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === corpus.count())
    val totalToks = corpus
      .select(size(split(col("text"), "\\s+")).cast("long").as("nt"))
      .agg(sum("nt")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === totalToks)
    rows.foreach { r =>
      val (b, cap, n, tok, waste) = (r.getAs[Long]("bucket"), r.getAs[Long]("bucket_cap"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[Long]("pad_waste"))
      assert(cap === (b + 1) * 16)
      assert(waste === cap * n - tok && waste >= 0)
      // every doc in bucket b has nt in [b*16, cap-1]: tokens bounded both ways
      assert(tok >= b * 16 * n && tok <= (cap - 1) * n)
      val u = r.getAs[Double]("util_r")
      assert(u > 0.0 && u <= 1.0)
    }
  }

  test("NN-descent: recall weakly non-decreasing per round, final strictly above the seeded init") {
    val rows = Similarity.simNnDescent.run(spark, sfDir).collect()
    assert(rows.length === 9, "mart must carry rounds 0..8 (budget 8, fixpoint rows replicated)")
    assert(rows.map(_.getAs[Long]("round")).toSeq === (0L to 8L), "rounds out of order")
    val rec = rows.map(_.getAs[Double]("recall_r")).toSeq
    // structural law: candidates always include the current list and an
    // eviction needs a strictly better (score, id) rank — recall@10
    // against the (score, id)-exact top-10 cannot go down
    rec.sliding(2).foreach { case Seq(a, b) => assert(b >= a, s"recall regressed: $rec") }
    // measured margin (K=20 build: 0.25 → ~0.99 at n=500, ~0.93 at
    // n=2000): the rounds must BEAT the cell-blocked init by far more
    // than the old K=10 plateau ever allowed
    assert(rec.last > rec.head + 0.4, s"NN-descent rounds did not improve on the seed: $rec")
    // the r14 verdict's Done bar: trajectory reaches >= 0.7 (measured
    // ~0.93 at n=2000, ~0.99 at n=500; generous slack for ulp-level
    // tie flips between the rehearsal and the engines)
    assert(rec.last >= 0.7, s"final graph recall below the round-15 bar: $rec")
    rows.foreach { r =>
      val (cp, h, tot) = (r.getAs[Long]("cand_pairs"), r.getAs[Long]("hits"), r.getAs[Long]("total"))
      assert(h >= 0 && h <= tot)
      if (r.getAs[Long]("round") == 0L) assert(cp === 0L)
      else assert(cp > 0L, "a descent round proposed no candidates")
    }
  }

  test("graph serve: every multi-entry walk strictly dominates probe-1 recall on the held-out queries") {
    val rows = Similarity.simGraphServe.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("variant")).toSeq ===
      Seq("graph_m1", "graph_m2", "graph_m4", "probe1"))
    val p = rows.last
    rows.foreach { r =>
      assert(r.getAs[Long]("scanned") > 0L)
      val h = r.getAs[Long]("hits")
      assert(h >= 0L && h <= 80L, "hits outside 8 queries x 10")
    }
    // measured margins (K=20 build, deg-10 serve core, medoid entries,
    // round-17 honest window): n=500 entry counts read 0.9875+;
    // n=2000 0.8375/0.9625/0.95 — vs probe-1's 0.275–0.3625. Every
    // entry count must beat the cell flood by a
    // wide gap, not a tie-break; the entry-count ORDERING is measured,
    // not asserted (visited sets do not nest across P — the beam can
    // detour differently, and P=2 measurably scans FEWER than P=1)
    rows.init.foreach { g =>
      assert(g.getAs[Double]("recall_r") > p.getAs[Double]("recall_r") + 0.2,
        s"${g.getAs[String]("variant")} did not dominate probe-1: $rows")
    }
  }

  test("graph-deployed: HNSW-over-PQ touches fewer true vectors than every exact-scored walk") {
    val rows = Similarity.simGraphDeployed.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("variant")).toSeq === Seq("hier_e1", "hier_e2"))
    rows.foreach { r =>
      assert(r.getAs[Long]("beam_rows") <= r.getAs[Long]("scanned"))
      val h = r.getAs[Long]("hits")
      assert(h >= 0L && h <= 80L, "hits outside 8 queries x 10")
    }
    // the composed path's whole point: true-vector touches (the re-rank
    // beam) stay below what EVERY exact-scored walk variant scans in
    // full vectors — the graph+codes memory posture. Asserted against a
    // fixed conservative floor instead of re-running sim_graph_serve
    // inside the test (round-17 ADVICE: the re-run doubled this test's
    // wall time and coupled its meaning to another gate's measurements):
    // the exact walks' measured min scan is ~1370 at n=500 and ~1960 at
    // n=2000, while the derived beam stays ~620–650 at both — 1000 sits
    // well under the walks' scans AND well above the beam, flagging a
    // real posture inversion with two-sided margin at every driver
    // corpus; re-derive it from sim_graph_serve's `scanned` column if
    // the serve core or walk budget ever changes
    val serveScanFloor = 1000L
    // guard the constant itself (r17 advice: a corpus or serve-budget
    // change could silently turn the floor vacuous): the deployed walk
    // shares the exact walks' step/degree budget, so its own measured
    // `scanned` column carries the walk-scan order of magnitude
    // (1499–1659 at n=500, larger at n=2000) — the floor must stay
    // below it to keep discriminating
    val minScanned = rows.map(_.getAs[Long]("scanned")).min
    assert(serveScanFloor <= minScanned,
      s"serveScanFloor $serveScanFloor no longer sits under the walk-scan order ($minScanned) - re-derive it from sim_graph_serve's scanned column")
    rows.foreach { r =>
      assert(r.getAs[Long]("beam_rows") < serveScanFloor,
        s"${r.getAs[String]("variant")} touched ${r.getAs[Long]("beam_rows")} vectors, " +
          s"not under the exact walks' documented min scan $serveScanFloor")
    }
    // measured with the honest query window: 0.975/0.9625 best-entry at
    // n=500, 0.85 at n=2000 — the best entry count stays above 0.75
    assert(rows.map(_.getAs[Long]("hits")).max >= 60L,
      s"graph-deployed recall collapsed: ${rows.mkString(", ")}")
  }

  test("deployed frontier: nesting laws hold and the x4 beam reads every pool ceiling") {
    val rows = Similarity.simDeployedFrontier.run(spark, sfDir).collect()
    assert(rows.length === 12, "probes {2,4,8,12} x beam mults {1,2,4}")
    val grid = rows.map(r => (r.getAs[Long]("probes"), r.getAs[Long]("beam_mult")) ->
      (r.getAs[Long]("hits"), r.getAs[Long]("ceiling_hits"))).toMap
    assert(grid.keySet === (for (p <- Seq(2L, 4L, 8L, 12L); m <- Seq(1L, 2L, 4L)) yield (p, m)).toSet)
    // in-gate requires pin pool nesting in p, beam nesting in mult, and
    // hits <= ceiling; here the measured shapes. At fixed mult, recall
    // never falls as the scan widens (1-hit slack, round-16 review: the
    // log-growth beam is NOT mathematically monotone against a linear
    // pool)
    for (m <- Seq(1L, 2L, 4L))
      Seq(2L, 4L, 8L, 12L).sliding(2).foreach { case Seq(a, b) =>
        assert(grid((a, m))._1 <= grid((b, m))._1 + 1L,
          s"frontier recall fell from probe $a to $b at mult $m")
      case _ => ()
      }
    // the round-17 headline (r16 verdict #2): the x4 beam buys back the
    // ENTIRE ADC ranking error at every probe count — measured equal to
    // the pool ceiling at all three driver corpora; 1-hit slack so a
    // regenerated corpus flags a real gap, not a tie flip
    for (p <- Seq(2L, 4L, 8L, 12L)) {
      val (h, c) = grid((p, 4L))
      assert(h >= c - 1L, s"the x4 beam stopped reading the ceiling at probe $p: $h vs $c")
    }
  }

  test("book append: the codebook freeze is free, the coarse freeze carries the tax") {
    val rows = Similarity.simBookAppend.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("variant")).toSeq ===
      Seq("frozen_both", "retrain_coarse", "retrained_both"))
    val by = rows.map(r => r.getAs[String]("variant") -> r.getAs[Long]("hits")).toMap
    // measured at every driver corpus: re-encoding under the FROZEN book
    // against the retrained coarse ties the fully retrained index
    // exactly (0.8375=0.8375 at n=2000, 0.875=0.875 at n=500) — asserted
    // with 1-hit slack so a future corpus regeneration flags only a real
    // divergence, not a tie-break flip
    assert(math.abs(by("retrain_coarse") - by("retrained_both")) <= 1L,
      s"the frozen book stopped matching the retrained book: $by")
    // and the frozen coarse carries a real tax (~0.08 measured)
    assert(by("frozen_both") <= by("retrain_coarse"),
      s"frozen coarse unexpectedly beat the retrained layout: $by")
  }

  test("graph append: two warm-start rounds land within a bounded tax of the full rebuild") {
    val rows = Similarity.simGraphAppend.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("variant")).toSeq ===
      Seq("appended_r1", "appended_r2", "rebuilt"))
    // conservation + degree cap + round monotonicity are required in-gate;
    // here the measured claim: the round-2 warm append stays within 0.1
    // recall of the rebuild (measured gaps 0.013 at n=500, 0.047 at
    // n=2000 — the priced retrain trigger)
    val by = rows.map(r => r.getAs[String]("variant") -> r.getAs[Long]("hits")).toMap
    val n = rows.head.getAs[Long]("total") / 10
    assert(by("appended_r2") >= by("rebuilt") - n,
      s"warm-start append tax exceeded 0.1 recall: $by")
  }

  test("streaming index append: two pinned micro-batch folds keep the index near the rebuild") {
    val rows = Similarity.streamIndexAppend.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("variant")).toSeq ===
      Seq("batch_1", "batch_2", "rebuilt"))
    val by = rows.map(r => r.getAs[String]("variant") -> r).toMap
    // exactly-2-folds, per-fold conservation, the degree cap, and the
    // denominator contract are required in-gate; here the measured
    // trade: the per-batch single-round cadence pays more than the bulk
    // two-round append (gaps 0.066 at n=500, 0.102 at n=2000 vs the
    // bulk gate's 0.013/0.047) but stays within 0.15 of the rebuild —
    // the priced consolidation trigger for an index under a live feed
    val tax = by("rebuilt").getAs[Double]("recall_r") -
      by("batch_2").getAs[Double]("recall_r")
    assert(tax <= 0.15, s"streamed index fell too far behind the rebuild: $tax")
    // and each fold's graph is a genuinely useful index, not a husk
    assert(by("batch_1").getAs[Double]("recall_r") >= 0.7)
    assert(by("batch_2").getAs[Double]("recall_r") >= 0.7)
  }

  test("streamed index policy: the θ=20 trigger fires mid-stream and consolidation recovers the drift") {
    val rows = Similarity.streamIndexPolicy.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("variant")).toSeq ===
      Seq("consolidate_2", "fold_1", "fold_2", "fold_3", "rebuilt"))
    val by = rows.map(r => r.getAs[String]("variant") -> r).toMap
    // executed-schedule ≡ trigger-replay, conservation, the degree cap,
    // and consolidate_2 ≥ fold_2 are required in-gate; here the measured
    // claims: the mid-stream consolidation recovers to within 0.05 of the
    // rebuild on the same member set (gaps 0.003 at n=500, 0.004 at
    // n=2000)...
    assert(by("consolidate_2").getAs[Double]("recall_r") >=
      by("rebuilt").getAs[Double]("recall_r") - 0.05,
      s"mid-stream consolidation no longer recovers the drift: $by")
    // ...and the post-consolidation fold keeps the LIVE index within 0.1
    // of the rebuild (0.911 vs 0.929 at n=2000, where the unconsolidated
    // 2-batch feed of st_index_append reads 0.827) — the deployed
    // policy's whole value
    assert(by("fold_3").getAs[Double]("recall_r") >=
      by("rebuilt").getAs[Double]("recall_r") - 0.1,
      s"post-consolidation fold fell behind the rebuild: $by")
  }

  test("serve freshness: the walk degrades under unconsolidated growth and consolidation recovers it") {
    val rows = Similarity.simServeFreshness.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("variant")).toSeq ===
      Seq("consolidated", "fold_1", "fold_2", "rebuilt"))
    val by = rows.map(r => r.getAs[String]("variant") ->
      r.getAs[Long]("hits")).toMap
    // member-escape, denominator, and entry-conservation laws are
    // required in-gate; here the measured ordering claims with a 2-hit
    // slack — the greedy walk is a heuristic, so near-saturated corpora
    // can invert an ordering by a hit (sf0.001 measured rebuilt 79 vs
    // consolidated 80; sf0.1 measured 57/64/69/77 where both orderings
    // hold with margin): consolidation serves no worse than the
    // unconsolidated fold-2 graph, and the rebuild stays near the top
    assert(by("consolidated") >= by("fold_2") - 2L,
      s"consolidation hurt the serve path: $by")
    assert(by("rebuilt") >= by("consolidated") - 2L,
      s"a fold artifact out-served the rebuild beyond walk noise: $by")
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") <= 80L)
      assert(r.getAs[Long]("scanned") >= 8L)
    }
  }

  test("serve policy: the reader recovers at the trigger and holds between consolidations") {
    val rows = Similarity.simServePolicy.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("variant")).toSeq ===
      Seq("consolidate_2", "fold_2", "fold_3", "rebuilt"))
    val by = rows.map(r => r.getAs[String]("variant") ->
      r.getAs[Long]("hits")).toMap
    // member-escape, denominator, and entry-conservation laws are
    // required in-gate; here the measured ordering claims with the
    // serve-freshness 2-hit walk-noise slack (sf0.1 measured
    // 57/69/69/77, both orderings hold with margin; sf0.001 measured
    // rebuilt 79 below the saturated events): the in-stream trigger
    // serves no worse than the unconsolidated fold-2 state, and the
    // rebuild stays near the top
    assert(by("consolidate_2") >= by("fold_2") - 2L,
      s"the in-stream consolidation hurt the serve path: $by")
    assert(by("rebuilt") >= by("consolidate_2") - 2L,
      s"a policy event out-served the rebuild beyond walk noise: $by")
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") <= 80L)
      assert(r.getAs[Long]("scanned") >= 8L)
    }
  }

  test("index quality audit: every persisted index artifact honors its contract") {
    val rows = Similarity.qIndexQuality.run(spark, sfDir).collect()
    assert(rows.length === 16, "one row per (artifact, check)")
    rows.foreach { r =>
      assert(r.getAs[Long]("violations") === 0L,
        s"index artifact violated its contract: $r")
      assert(r.getAs[Boolean]("passed"), s"index artifact check failed: $r")
    }
  }

  test("shuffle export emits a reproducible permutation 1..n that is not the id order") {
    def run() = TextOps.tShuffleExport.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shuffle_pos"))
    val a = run()
    assert(a.map(_._2).sorted.toSeq === (1L to a.length).toSeq, "not a permutation")
    assert(a.toSeq !== a.sortBy(_._1).map(_._1).zip(1L to a.length).toSeq
      .map(p => p._1 -> p._2), "shuffle left ids in original order")
    assert(run().toMap === a.toMap, "shuffle not reproducible across runs")
  }

  test("hard negatives: label-split mining laws and the margin arithmetic hold") {
    val rows = Similarity.simHardNegatives.run(spark, sfDir).collect()
    assert(rows.length === 40, "8 held-out queries x 5 negatives")
    val labelOf = core.tbl(spark, sfDir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("neg_rank"))
      // negatives come back hardest-first and never share the query label;
      // the positive really is same-label and not the query itself
      val negScores = sorted.map(_.getAs[Double]("neg_r"))
      assert(negScores.zip(negScores.tail).forall { case (a, b) => a >= b },
        s"negatives out of hardness order for qid $q")
      sorted.foreach { r =>
        assert(labelOf(r.getAs[Long]("neg_id")) === r.getAs[Int]("neg_label"))
        assert(r.getAs[Int]("neg_label") !== r.getAs[Int]("q_label"))
        val p = r.getAs[Long]("pos_id")
        assert(p != q && labelOf(p) == r.getAs[Int]("q_label"),
          s"positive $p is not a same-label non-self neighbor of $q")
        // margin is the rounded difference of the unrounded scores — the
        // rounded-operand difference can only drift by the rounding grain
        assert(math.abs(r.getAs[Double]("margin_r") -
          (r.getAs[Double]("pos_r") - r.getAs[Double]("neg_r"))) < 2e-6)
      }
    }
  }

  test("deployed negative mining: recall is bounded by the pool and softening is one-sided") {
    val rows = Similarity.simAnnNegatives.run(spark, sfDir).collect()
    assert(rows.length === 8, "one row per held-out query")
    rows.foreach { r =>
      assert(r.getAs[Long]("pool_neg_rows") <= r.getAs[Long]("pool_rows"))
      val h = r.getAs[Long]("hits")
      assert(h >= 0L && h <= 5L)
      assert(r.getAs[Double]("recall_r") === h / 5.0)
      // a subset's hardest negative can never beat the corpus' hardest,
      // so the mined margin is never tighter than the true margin
      assert(r.getAs[Long]("soft_bias_fp") >= 0L)
      assert(r.getAs[Long]("margin_mined_fp") >=
        r.getAs[Long]("margin_true_fp"))
      // full mining recall forces zero softening (top-1 recovered ⇒
      // identical hardest negative ⇒ identical margin)
      if (h == 5L) assert(r.getAs[Long]("soft_bias_fp") === 0L)
    }
    // the probe-4 pool must surface at least SOME true hard negatives
    // across the window — a zero total would mean the index is useless
    // for mining, which the deployed-recall gates already refute
    assert(rows.map(_.getAs[Long]("hits")).sum > 0L)
  }

  test("triplet export: shards partition the corpus and the ledger bounds hold") {
    val rows = Similarity.simTripletExport.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("shard")).toSeq === (0L to 7L))
    val n = core.tbl(spark, sfDir, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_anchors")).sum === n, "shard ledger lost anchors")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_triplets") <= r.getAs[Long]("n_anchors"))
      assert(r.getAs[Long]("n_nn_same_label") <= r.getAs[Long]("n_anchors"))
    }
    // 10 roughly-balanced random labels: most degree-20 neighborhoods
    // hold both a same- and wrong-label row, so most anchors emit
    assert(rows.map(_.getAs[Long]("n_triplets")).sum > n / 2,
      "triplet yield collapsed — the graph's label mix is broken")
    // and rank-1 label consistency must sit near the 10% base rate,
    // not at zero (labels ARE random — this is the honest reading)
    assert(rows.map(_.getAs[Long]("n_nn_same_label")).sum > 0L)
  }

  test("mmr rerank: objective is monotone, the audit identity holds, and the set is more diverse than plain top-10") {
    val rows = Similarity.simMmrRerank.run(spark, sfDir).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length === 10, "a pick repeated")
    assert(rows.head.getAs[Double]("maxsim_r") === 0.0, "pick 1 paid a similarity tax")
    rows.foreach { r =>
      // the per-row audit identity (rounded operands can drift a grain)
      assert(math.abs(r.getAs[Double]("mmr_r") -
        (r.getAs[Double]("rel_r") - 0.5 * r.getAs[Double]("maxsim_r"))) < 2e-6)
      assert(r.getAs[Double]("maxsim_r") >= 0.0)
    }
    // greedy MMR's objective is weakly decreasing: maxsim only grows and
    // candidates only deplete, so each step's max is bounded by the last
    val sc = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("mmr_r"))
    assert(sc.zip(sc.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"MMR objective rose mid-selection: ${sc.toSeq}")
    // the point of the operator: the selected set is no less diverse
    // (mean intra-set cosine) than the plain relevance top-10.
    // MEASURED PROPERTY OF THE PINNED TESTDATA, not a law of greedy MMR
    // (r19 ADVICE #3): at λ=0.5 greedy MMR trades relevance for diversity
    // pick-by-pick but guarantees nothing about the MEAN pairwise cosine
    // of the final set — a regenerated corpus could legitimately flip
    // this by a hair. If dataset regeneration trips the assert, re-measure
    // and re-pin (or drop to a slack bound); do NOT debug the operator —
    // the per-pick objective monotonicity above is the algorithmic law.
    val e = core.tbl(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def intra(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- ids.indices if i < j)
        yield dot(e(ids(i)), e(ids(j)))
      ps.sum / ps.length
    }
    val q = e(Similarity.Q1.toLong)
    val top10 = e.toSeq.filter(_._1 != Similarity.Q1.toLong)
      .map { case (id, v) => (id, dot(v, q)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    val mmr10 = rows.map(_.getAs[Long]("vec_id")).toSeq
    assert(intra(mmr10) <= intra(top10) + 1e-9,
      s"MMR set less diverse than plain top-10: ${intra(mmr10)} vs ${intra(top10)}")
  }

  test("ce distill: the export is the exact pos x neg grid of the re-ranker's own teacher scores") {
    val head = TextOps.tCrossRerank.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("ce_rank") ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("ce_fp"))).toMap
    val rows = TextOps.tCeDistill.run(spark, sfDir).collect()
    val posN = head.keys.count(_ <= TextOps.CeDistillPos.toLong)
    val negN = head.keys.count(_ >= TextOps.CeDistillNegFrom.toLong)
    assert(rows.length === posN * negN, "export is not the full pos x neg grid")
    rows.foreach { r =>
      val (pr, nr) = (r.getAs[Long]("pos_rank"), r.getAs[Long]("neg_rank"))
      assert(pr <= TextOps.CeDistillPos.toLong && nr >= TextOps.CeDistillNegFrom.toLong)
      // composition law: every exported pair reconstructs from the
      // re-ranker's own head — same ids, margin = the teacher-score
      // difference (the shared ceScoredHead kernel, asserted end-to-end)
      val (pid, ps) = head(pr)
      val (nid, ns) = head(nr)
      assert(r.getAs[Long]("pos_id") === pid && r.getAs[Long]("neg_id") === nid,
        s"pair ($pr,$nr) ids diverge from the re-ranker head")
      assert(r.getAs[Long]("margin_fp") === ps - ns, s"margin broke for ($pr,$nr)")
      assert(r.getAs[Long]("margin_fp") >= 0L)
    }
  }

  test("hybrid rrf: fused ranks reconstruct the fixed-point scores and self is excluded") {
    val rows = TextOps.tHybridRrf.run(spark, sfDir).collect()
    assert(rows.length === 10)
    def share(rk: Any): Long = rk match {
      case null => 0L
      case r: Long => math.floor(1000000000000.0 / (60.0 + r)).toLong
    }
    val fps = rows.map(_.getAs[Long]("rrf_fp"))
    assert(fps.zip(fps.tail).forall { case (a, b) => a >= b }, "fusion not rank-ordered")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") !== Similarity.Q1.toLong, "query doc retrieved itself")
      val (l, s) = (r.get(r.fieldIndex("lex_rk")), r.get(r.fieldIndex("sem_rk")))
      assert(l != null || s != null, "a fused doc appeared in neither arm")
      assert(r.getAs[Long]("rrf_fp") === share(l) + share(s),
        s"rrf share arithmetic broke: $r")
    }
    // on this corpus text and embeddings are independent, so both arms
    // must contribute to the fused head (neither arm dominates)
    assert(rows.exists(_.get(rows.head.fieldIndex("lex_rk")) != null))
    assert(rows.exists(_.get(rows.head.fieldIndex("sem_rk")) != null))
  }

  test("cross rerank: permutation of the fused head, stub score reproduced, deltas account") {
    val rows = TextOps.tCrossRerank.run(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("ce_rank"))
    assert(rows.nonEmpty && rows.length <= 20)
    // ce_rank is a dense 1..n permutation and moved accounts exactly
    assert(rows.map(_.getAs[Long]("ce_rank")).toSeq === (1L to rows.length).toSeq)
    assert(rows.map(_.getAs[Long]("rrf_rank")).sorted.toSeq === (1L to rows.length).toSeq,
      "re-rank added or dropped a candidate (rrf_rank is not a permutation)")
    rows.foreach(r => assert(
      r.getAs[Long]("moved") === r.getAs[Long]("rrf_rank") - r.getAs[Long]("ce_rank")))
    assert(rows.map(_.getAs[Long]("moved")).sum === 0L, "rank deltas must net to zero")
    // ordering law: ce_fp descending with doc_id tie-break
    val key = rows.map(r => (-r.getAs[Long]("ce_fp"), r.getAs[Long]("doc_id"))).toSeq
    assert(key === key.sorted, "head not ordered by (ce_fp desc, doc_id)")
    // the stub score is reproducible from the raw texts: recompute one
    // pair's aligned code-point interaction (both sides truncated to the
    // model window) and compare to the gate's ce_fp
    val docs = core.tbl(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qCp = docs(Similarity.Q1.toLong).codePoints().limit(TextOps.CeMaxCp).toArray
    rows.take(3).foreach { r =>
      val cp = docs(r.getAs[Long]("doc_id")).codePoints().limit(TextOps.CeMaxCp).toArray
      val exp = (0 until math.min(qCp.length, cp.length))
        .foldLeft(0L)((s, i) => s + qCp(i).toLong * cp(i).toLong)
      assert(r.getAs[Long]("ce_fp") === exp,
        s"stub score not reproducible for doc ${r.getAs[Long]("doc_id")}")
    }
  }
}
