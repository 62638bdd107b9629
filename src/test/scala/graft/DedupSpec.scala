package graft

import java.nio.file.Files
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** End-to-end tests of the near-duplicate pipelines over a tiny corpus
  * written as a `documents.parquet` table (the same access path the driver
  * gates use). Verifies planted-duplicate recall, non-duplicate rejection,
  * and the short-document guard (sequence(1, n<1) would descend and throw
  * under ANSI without it). */
class DedupSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  /** Write a corpus with: doc 5 ≡ near-dup of doc 105 (planted by the
    * pipeline itself via doc_id % 5), two unrelated docs, and degenerate
    * 1- and 2-token docs that exercise the ANSI guards. */
  private lazy val corpusDir: String = {
    val dir = Files.createTempDirectory("graft_dedup_test").toString
    // long docs (~200 tokens) keep the pipeline's 3-token dup-probe append a
    // small relative perturbation; docs 3 and 13 are EXACT duplicates of each
    // other (disjoint vocabulary from the rest) — the deterministic guarantee
    // every sketch must honor
    val words = (0 until 440).map(i => s"tok${i * i % 997}x$i")
    val docs = Seq(
      (1L, words.take(200).mkString(" ")),
      (2L, words.slice(10, 210).reverse.mkString(" ")),
      (3L, words.slice(220, 420).mkString(" ")),
      (5L, words.slice(20, 220).mkString(" ")), // %5==0 → near-dup planted at 100005
      (7L, "solo"), // 1 token: shingles/bigrams must be empty, not crash
      (11L, "two tokens"), // 2 tokens: 3-shingles empty, bigrams fine
      (13L, words.slice(220, 420).mkString(" ")) // exact copy of doc 3
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("minhash-LSH finds the planted near-dup and the exact-dup pair, nothing unrelated") {
    val pairs = Dedup.ddMinHashLsh.run(spark, corpusDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((5L, 100005L)), s"planted pair missing from $pairs")
    assert(pairs.contains((3L, 13L)), s"exact-dup pair missing from $pairs")
    // unrelated docs must not pair (their 3-shingle Jaccard ≈ 0: doc 2 is reversed)
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(1L, 2L) })
  }

  test("simhash pairs exact duplicates at Hamming 0 and skips degenerate docs") {
    val pairs = Dedup.ddSimHash.run(spark, corpusDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // identical shingle sets ⇒ identical fingerprints ⇒ always paired
    assert(pairs.contains((3L, 13L)), s"exact-dup pair missing from $pairs")
    // degenerate empty-shingle docs must NOT fingerprint-collide with each other
    assert(!pairs.contains((7L, 11L)))
  }

  test("lane-packed simhash matches an unpacked 64-sum reference past 65536 shingles") {
    // 70,002 distinct tokens → 70,000 distinct 3-shingles: past the 16-bit
    // lane limit that silently cross-carried before the 32-bit widening.
    // The reference below is the oracle's construction verbatim — one
    // substring+compare sum per bit, no packing — so any carry between
    // lanes would flip a low-order bit of the packed result.
    val doc = Seq((1L, (0 until 70002).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = Dedup.simhashFingerprints(doc).select("bits").as[String].head()
    val expl = doc
      .select(explode(Dedup.shingles3(split(col("text"), "\\s+"))).as("s"))
      .select(md5(concat(lit("s1|"), col("s"))).as("m1"),
        md5(concat(lit("s2|"), col("s"))).as("m2"))
    val hexHigh = "89abcdef".map(_.toString)
    val sums = (1 to 64).map { j =>
      val (m, pos) = if (j <= 32) (col("m1"), j) else (col("m2"), j - 32)
      sum(when(substring(m, pos, 1).isin(hexHigh: _*), 1L).otherwise(0L)).as(s"s$j")
    }
    val row = expl.agg(count(lit(1)).as("n"), sums: _*).head()
    val n = row.getLong(0)
    assert(n > 65536L, s"fixture must exceed the old lane limit, got $n")
    val reference = (1 to 64).map(j => if (row.getLong(j) * 2 >= n) '1' else '0').mkString
    assert(packed === reference)
  }

  test("ngram-jaccard verifies the planted pair above the 0.8 threshold") {
    val rows = Dedup.ddNgramJaccard.run(spark, corpusDir)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect()
    val planted = rows.find(r => r._1 == 5L && r._2 == 100005L)
    assert(planted.isDefined && planted.get._3 >= 0.8)
  }

  test("short documents (1–2 tokens) flow through all pipelines without ANSI crashes") {
    // would throw INVALID_ARRAY_INDEX before the guards; now they simply
    // produce no candidate pairs involving the degenerate docs
    val mh = Dedup.ddMinHashLsh.run(spark, corpusDir).select("a_id", "b_id")
      .as[(Long, Long)].collect()
    assert(!mh.exists(p => p._1 == 7L || p._2 == 7L || p._1 == 11L || p._2 == 11L))
    val ng = Dedup.ddNgramJaccard.run(spark, corpusDir).select("a_id", "b_id")
      .as[(Long, Long)].collect()
    assert(!ng.exists(p => p._1 == 7L || p._2 == 7L))
  }

  test("incremental dedup: the store catches every cross-batch re-delivery") {
    val rows = Dedup.ddIncremental.run(spark, sfDir).collect()
      .map(r => r.getAs[Int]("batch") ->
        (r.getAs[Long]("n_arrived"), r.getAs[Long]("n_unique"),
          r.getAs[Long]("n_new"), r.getAs[Long]("store_rows_after"))).toMap
    val (a1, u1, n1, s1) = rows(1)
    val (a2, u2, n2, s2) = rows(2)
    assert(n1 === u1 && s1 === u1) // empty store: every unique fp is new
    assert(a2 > u2 || n2 < u2, "batch 2 must carry duplicates")
    assert(n2 < u2, "re-delivered texts must be caught by the STORE, not intra-batch dedup")
    assert(s2 === s1 + n2) // append-only delta
    assert(a1 + a2 > s2) // overall: store smaller than arrivals
  }

  test("exact dedup groups identical content and keeps the smallest doc_id") {
    // ddExact plants a copy of doc 7 (doc_id % 7) at 200007; docs 3 and 13
    // are identical by construction → two multi-copy groups
    val out = Dedup.ddExact.run(spark, corpusDir)
    val grouped = out.filter(col("n_copies") > 1)
      .select("canonical_doc_id").as[Long].collect().sorted
    assert(grouped === Array(3L, 7L))
    assert(out.count() === 6) // 6 distinct contents (3≡13)
  }
}
