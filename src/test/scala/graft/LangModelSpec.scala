package graft

import graft.llm.LangModel

/** Invariants of the corpus-trained bigram LM the hash oracle can't
  * express: mass bounds, model/score consistency, and the one property
  * that makes the score a useful curation signal — the training stratum
  * ranks above every other language under its own model. */
class LangModelSpec extends SparkSpec {

  test("lm score: masses bound each other and coverage bounds the count") {
    val rows = LangModel.lmScore.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      val known = r.getAs[Long]("known_bigrams")
      assert(known >= 0 && known <= n)
      // every known bigram contributes n_bg ≤ n_ctx (a pair can't outnumber
      // its own context), so the doc-level masses preserve the order
      assert(r.getAs[Long]("pred_mass") <= r.getAs[Long]("ctx_mass"))
      Option(r.getAs[java.lang.Double]("predict_r")).foreach(p =>
        assert(p >= 0.0 && p <= 1.0))
    }
  }

  test("lm score: the en training stratum is most predictable under its own model") {
    val rows = LangModel.lmScore.run(spark, sfDir).collect()
      .filter(_.getAs[java.lang.Double]("predict_r") != null)
    val byLang = rows.groupBy(_.getAs[String]("lang")).map { case (l, rs) =>
      l -> rs.map(_.getAs[java.lang.Double]("predict_r").doubleValue).sum / rs.size
    }
    val en = byLang("en")
    byLang.filter(_._1 != "en").foreach { case (l, avg) =>
      assert(en > avg, s"en avg $en should exceed $l avg $avg")
    }
  }

  test("lm filter: keep rates in [0,1], and the training stratum passes its own filter most often") {
    val rows = LangModel.lmFilter.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      val f = r.getAs[Double]("kept_frac"); assert(f >= 0.0 && f <= 1.0)
    }
    val byLang = rows.map(r => r.getAs[String]("lang") -> r.getAs[Double]("kept_frac")).toMap
    byLang.filter(_._1 != "en").foreach { case (l, f) =>
      assert(byLang("en") > f, s"en kept_frac ${byLang("en")} should exceed $l's $f")
    }
  }

  test("lm model head: counts are positive, non-increasing, and en-only by construction") {
    val top = LangModel.lmTopBigrams.run(spark, sfDir).collect()
    assert(top.length === 20)
    val counts = top.map(_.getAs[Long]("n_bg"))
    assert(counts.forall(_ > 0))
    assert(counts.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("Kneser-Ney: probabilities in range, discounting visible in both directions") {
    // the in-gate require already enforces per-context mass conservation
    // over EVERY context; here the mart-level shape
    val rows = LangModel.lmKneserNey.run(spark, sfDir).collect()
    assert(rows.length === 20)
    val counts = rows.map(_.getAs[Long]("n_bg"))
    assert(counts.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    rows.foreach { r =>
      val (mle, kn) = (r.getAs[Long]("p_mle_micro"), r.getAs[Long]("p_kn_micro"))
      assert(mle > 0 && mle <= 1000000L)
      assert(kn >= 0 && kn <= 1000000L)
      assert(r.getAs[Long]("n_follow") > 0 && r.getAs[Long]("n_prec") > 0)
    }
    // redistribution is real: the discount must take mass from some head
    // bigrams AND the continuation term must give some back elsewhere
    // (measured 300 up / 611 down among all bigrams at sf0.001; the
    // top-20 head always contains both directions on this corpus)
    assert(rows.exists(r => r.getAs[Long]("p_kn_micro") < r.getAs[Long]("p_mle_micro")),
      "no bigram lost mass to the discount")
    assert(rows.exists(r => r.getAs[Long]("p_kn_micro") > r.getAs[Long]("p_mle_micro")),
      "no bigram gained continuation mass")
  }

  test("trigram Kneser-Ney: probabilities in range, recursion grounded in the bigram continuation") {
    // both per-context conservation laws (top order over c(w1w2.),
    // middle order over the continuation masses) are REQUIREd in-gate
    // across EVERY context; here the emitted head's shape
    val rows = LangModel.lmKneserNey3.run(spark, sfDir).collect()
    assert(rows.length === 20)
    val counts = rows.map(_.getAs[Long]("n_tri"))
    assert(counts.forall(_ > 0))
    assert(counts.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    rows.foreach { r =>
      val (mle, kn2, kn3) = (r.getAs[Long]("p_mle3_micro"),
        r.getAs[Long]("p_kn2_micro"), r.getAs[Long]("p_kn3_micro"))
      assert(mle > 0 && mle <= 1000000L)
      // each order's rendered probability is a genuine sub-distribution
      // member: positive (the discounted term of a SEEN type plus a
      // non-negative interpolation) and never above full mass
      assert(kn2 > 0 && kn2 <= 1000000L, s"middle-order mass out of range: $kn2")
      assert(kn3 > 0 && kn3 <= 1000000L, s"top-order mass out of range: $kn3")
      assert(r.getAs[Long]("n_tri") <= r.getAs[Long]("n_tctx"))
    }
    // the discount must visibly redistribute at the top order too
    assert(rows.exists(r => r.getAs[Long]("p_kn3_micro") < r.getAs[Long]("p_mle3_micro")),
      "no trigram lost mass to the discount")
  }
}
