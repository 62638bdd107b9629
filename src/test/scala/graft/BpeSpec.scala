package graft

import graft.llm.Bpe
import org.apache.spark.sql.functions._

/** BPE trainer/tokenizer invariants the hash oracle can't express — the
  * monotonicity law of merge counts, hierarchy (merges built from earlier
  * merges), and the accounting relationship between the tokenizer's output
  * and raw character/word counts. */
class BpeSpec extends SparkSpec {

  test("trainer: batched structure — contiguous ranks, bounded rounds, per-round laws") {
    val rows = Bpe.bpeTrain.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("merge_rank")).toSeq === (1L to rows.length))
    assert(rows.length >= Bpe.BpeRounds && rows.length <= Bpe.BpeRounds * Bpe.BpeBatch)
    assert(rows.map(_.getAs[Long]("round")).distinct.sorted.toSeq ===
      (1L to Bpe.BpeRounds))
    assert(rows.forall(_.getAs[Long]("pair_count") > 0))
    rows.groupBy(_.getAs[Long]("round")).foreach { case (rr, batch) =>
      assert(batch.length <= Bpe.BpeBatch, s"round $rr overfilled")
      // WITHIN a round counts are selection-ordered non-increasing (across
      // rounds batching legitimately breaks monotonicity: a pair skipped
      // for conflicting with a winner can outrank later rounds' winners)
      val cs = batch.sortBy(_.getAs[Long]("merge_rank")).map(_.getAs[Long]("pair_count"))
      assert(cs.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
      // the batch is mutually NON-INTERACTING: no shared symbol — the
      // property that makes batched application order-free and the
      // reported counts exact
      val syms = batch.flatMap(r =>
        Seq(r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
      assert(syms.distinct.length === syms.length,
        s"round $rr selected conflicting pairs: ${syms.mkString(",")}")
    }
    // merged symbols are exactly left || right
    rows.foreach { r =>
      assert(r.getAs[String]("merged_sym") ===
        r.getAs[String]("left_sym") + r.getAs[String]("right_sym"))
    }
  }

  test("trainer: batched selection with M=1 reproduces the sequential trainer exactly") {
    // the equivalence that pins the batched rule to textbook BPE: capped at
    // one merge per round, the local-maxima selection IS the global argmax,
    // so 8 batched rounds must equal 8 one-at-a-time rounds of the retained
    // independent sequential implementation
    val batched = Bpe.trainMergesBatched(spark, sfDir, rounds = 8, batch = 1)
      .map(m => (m._2, m._3, m._4))
    val sequential = Bpe.trainMergesSequential(spark, sfDir, rounds = 8)
    assert(batched === sequential)
  }

  test("trainer: incrementally maintained pair counts equal a full recount every round") {
    // round-12 queue #5's Done bar: the delta-maintained pair table must be
    // key-for-key identical to recounting the whole vocabulary state after
    // each round — auditMaintenance=true makes the trainer itself verify
    // the equality (a loud require) at every round boundary, over MORE
    // rounds than the gate budget so the maintenance survives deep chains
    val audited = Bpe.trainMergesBatched(spark, sfDir, rounds = 6, batch = 3,
      auditMaintenance = true)
    assert(audited.nonEmpty)
    // and the maintained trainer's selection stream is byte-identical to
    // the gate's memoized table on the shared (rounds, batch) prefix
    val gate = Bpe.trainMergesR(spark, sfDir)
    assert(audited.take(gate.length) === gate)
  }

  test("trainer: a pair whose input equals another's merged output is excluded from the batch") {
    // the closed-set conflict rule's regression fixture (round-12 ADVICE):
    // (a, b) at count 10 outranks (x, ab) at count 6 — and (x, ab)'s INPUT
    // symbol 'ab' equals (a, b)'s OUTPUT, so co-selecting them would let
    // (a, b)'s replace manufacture fresh '<ab>' symbols that (x, ab)'s
    // pattern then matches, making its reported count a lie. The
    // lower-ranked pair must lose; the symbol-disjoint (c, d) must still
    // fill the batch
    val s2 = spark; import s2.implicits._
    val pairs = Seq(("a", "b", 10L), ("x", "ab", 6L), ("c", "d", 5L))
      .toDF("pa", "pb", "cnt")
    val sel = Bpe.selectBatch(pairs, batch = 3)
    assert(sel === Seq(("a", "b", 10L), ("c", "d", 5L)))
    // the mirror case: the higher-ranked pair's INPUT equals the lower's
    // OUTPUT — (ab, z) outranks (a, b); (a, b) must be excluded because
    // applying it would destroy/alter occurrences feeding (ab, z)
    val pairs2 = Seq(("ab", "z", 10L), ("a", "b", 6L), ("c", "d", 5L))
      .toDF("pa", "pb", "cnt")
    val sel2 = Bpe.selectBatch(pairs2, batch = 3)
    assert(sel2 === Seq(("ab", "z", 10L), ("c", "d", 5L)))
  }

  test("trainer: learned table is hierarchical — later merges consume earlier ones") {
    val rows = Bpe.bpeTrain.run(spark, sfDir).collect()
    val merged = rows.map(_.getAs[String]("merged_sym")).toSet
    val participants = rows.flatMap(r =>
      Seq(r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
    // at least one later merge uses an earlier round's output as a symbol
    assert(participants.exists(s => s.length > 1 && merged.contains(s)))
  }

  test("packer: BPE layout obeys the prefix-sum law and bills tokenizer counts") {
    import SparkSpec.spark.implicits._
    val rows = Bpe.bpePack.run(spark, sfDir)
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
    val acct = Bpe.bpeTokenize.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_tokens")).toMap
    rows.foreach { case (id, _, n, _, _, _, _) => assert(n === acct(id), s"doc $id") }
  }

  test("vocabulary: contiguous ids, chars before merges, occurrence conservation") {
    val v = Bpe.bpeVocab.run(spark, sfDir).collect()
    assert(v.map(_.getAs[Long]("token_id")).toSeq === (0L until v.length))
    val (chars, merges) = v.partition(_.getAs[String]("kind") == "char")
    // one vocab entry per trained merge (distinct surface forms)
    val trained = Bpe.bpeTrain.run(spark, sfDir).collect()
    assert(merges.length === trained.map(_.getAs[String]("merged_sym")).distinct.length)
    assert(chars.forall(_.getAs[String]("symbol").length == 1))
    assert(chars.map(_.getAs[Long]("token_id")).max < merges.map(_.getAs[Long]("token_id")).min)
    // conservation: every token the tokenizer emits is some vocab entry —
    // the two artifacts must account for the same corpus total
    val vocabTotal = v.map(_.getAs[Long]("n_occurrences")).sum
    val tokenizeTotal = Bpe.bpeTokenize.run(spark, sfDir).collect()
      .map(_.getAs[Long]("n_bpe_tokens")).sum
    assert(vocabTotal === tokenizeTotal)
  }

  test("tokenizer: per-doc counts bracket between word count and character count") {
    val toks = Bpe.bpeTokenize.run(spark, sfDir).collect()
    assert(toks.length === 500)
    toks.foreach { r =>
      val (w, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))
      assert(t >= w, s"doc ${r.getAs[Long]("doc_id")}: every word is ≥1 token")
      if (w > 0)
        assert(r.getAs[Double]("fertility") === t.toDouble / w)
    }
    // merges actually fire: total tokens strictly below total characters
    val chars = core.tbl(spark, sfDir, "documents")
      .select(aggregate(
        filter(split(lower(col("text")), "\\s+"), x => x.rlike("^[a-z]+$")),
        lit(0L), (a, w) => a + length(w).cast("long")).as("c"))
      .agg(sum("c")).head().getLong(0)
    assert(toks.map(_.getAs[Long]("n_bpe_tokens")).sum < chars)
  }
}
