package graft.operators

import graft.{QueryDef, core}
import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage: the fuzzy-matching pass a warehouse
  * runs over a dimension before trusting its keys (reference
  * `data_quality.py` stops at exact uniqueness checks; real MDM needs
  * near-matches too). The non-negotiable scale rule is BLOCKING: never
  * score all pairs — partition candidates into bounded blocks by a cheap
  * deterministic key and only score within a block. Candidate volume is
  * then Σ|block|² with |block| capped by the key design, i.e. linear in
  * the table with a constant factor, instead of N² (the same posture as
  * Dedup's LSH bands: the bucket join IS the candidate generator).
  */
object Linkage {

  /** er1 — blocked pairwise Levenshtein over the customer dimension.
    * Block key = the name's leading digit run minus its last two digits
    * (`substr(c_name, 10, 7)`), so a block holds at most 100 entities no
    * matter how large the dimension grows — the bound that keeps the
    * within-block self-join O(100²) per block. Pairs at edit distance ≤ 1
    * (one typo'd digit) are counted per block; the emitted mart is the
    * per-block audit (members, near-match pairs) a steward reviews before
    * survivorship. Both engines' `levenshtein` is the exact integer DP —
    * no float, no RNG, hash-stable. */
  val dFuzzyMatch: QueryDef = QueryDef(
    "d_fuzzy_match",
    Some("""
      WITH c AS (
        SELECT c_custkey, c_name, substr(c_name, 10, 7) AS blk FROM customer),
      pairs AS (
        SELECT a.blk, CAST(count(*) AS BIGINT) AS n_pairs
        FROM c a JOIN c b
          ON a.blk = b.blk AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
        GROUP BY a.blk),
      members AS (
        SELECT blk, CAST(count(*) AS BIGINT) AS n_members FROM c GROUP BY blk)
      SELECT m.blk, m.n_members, CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs
      FROM members m LEFT JOIN pairs p ON m.blk = p.blk
      ORDER BY m.blk
    """)) { (spark, dir) =>
    val c = tbl(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        substring(col("c_name"), 10, 7).as("blk"))
    // blocking join: both sides shuffle on blk only — the quadratic
    // levenshtein work is confined inside each ≤100-row block. The
    // THRESHOLDED levenshtein (returns -1 once the distance provably
    // exceeds k) runs the banded O(k·n) DP instead of the full O(n²)
    // table — same ≤1 predicate, ~15× less work per pair, which is the
    // dominant cost of the gate (the oracle's unthresholded form is
    // result-identical under the filter)
    val pairs = c.as("a").join(c.as("b"),
        col("a.blk") === col("b.blk") && col("a.c_custkey") < col("b.c_custkey"))
      .filter(levenshtein(col("a.c_name"), col("b.c_name"), 1) =!= -1)
      .groupBy(col("a.blk").as("blk"))
      .agg(count(lit(1)).as("n_pairs"))
    val members = c.groupBy("blk").agg(count(lit(1)).as("n_members"))
    members.join(pairs, Seq("blk"), "left")
      .select(col("blk"), col("n_members"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
      .orderBy("blk")
  }

  val all: Seq[QueryDef] = Seq(dFuzzyMatch)
}
