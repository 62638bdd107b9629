package graft

import graft.llm.Cluster
import org.apache.spark.sql.functions._

/** Connected-component dup clustering: the generic propagation core on a
  * hand-built graph, and the chain property of the gate corpus — base and
  * v2 share a cluster with NO direct edge, proving the operator computes a
  * real transitive closure rather than a per-key groupBy. */
class ClusterSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("components labels a path graph and an isolated pair by their min ids") {
    // path 1—2—3—4—5 (diameter 4: needs several propagation rounds) + pair 10—11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a_id", "b_id")
    val labels = Cluster.components(edges)
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(labels(_) == 1L), s"path mislabeled: $labels")
    assert(labels(10L) == 10L && labels(11L) == 10L)
  }

  test("components falls back to star contraction when propagation rounds run out") {
    // chain 0—1—…—63 (diameter 63). maxIters=2 reaches distance ~4, far
    // short of the diameter, so the fallback MUST fire for correct labels.
    val edges = (0L until 63L).map(i => (i, i + 1L)).toDF("a_id", "b_id")
    val labels = Cluster.components(edges, maxIters = 2, maxDepth = 1)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 64)
    assert((0L to 63L).forall(labels(_) == 0L), s"chain mislabeled: $labels")
    // maxDepth = 0 restores strict mode: loud, structured failure
    val ex = intercept[IllegalArgumentException] {
      Cluster.components(edges, maxIters = 1, maxDepth = 0).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("star contraction labels chains, stars and forests by component min") {
    // reversed-id chain (worst case for min-propagation), a star, a pair
    val chain = (0L until 40L).map(i => (100L - i, 100L - i - 1L))
    val extra = Seq((7L, 3L), (7L, 4L), (7L, 5L), (200L, 201L))
    val labels = Cluster.starContraction((chain ++ extra).toDF("a_id", "b_id"))
      .as[(Long, Long)].collect().toMap
    assert((60L to 100L).forall(labels(_) == 60L), s"chain mislabeled: $labels")
    assert(Seq(3L, 4L, 5L, 7L).forall(labels(_) == 3L))
    assert(labels(200L) == 200L && labels(201L) == 200L)
  }

  test("gate corpus plants chains: base—v1 and v1—v2 edge, no base—v2 edge") {
    val edges = Cluster.dupEdges(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val bases = edges.collect { case (a, b) if b == a + 100000L => a }
    assert(bases.nonEmpty, "no planted base—v1 edges found")
    val d = bases.min
    assert(edges.contains((d + 100000L, d + 200000L)), "v1—v2 edge missing")
    assert(!edges.contains((d, d + 200000L)),
      "base—v2 edged directly — chain construction broken, closure untested")
  }

  test("dedup_cluster merges each chain into one cluster with the base as canonical") {
    val out = Cluster.ddCluster.run(spark, sfDir)
      .select("doc_id", "canonical_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    val byDoc = out.map(r => r._1 -> r).toMap
    val bases = out.map(_._1).filter(id => byDoc.contains(id + 100000L) && id < 100000L)
    assert(bases.nonEmpty)
    // base heads can coincide across docs (tiny sf0.001 vocabulary), merging
    // chains — so assert the chain invariant, not a specific canonical: all
    // three members share one canonical ≤ base, in a cluster of ≥ 3
    bases.foreach { d =>
      val canon = byDoc(d)._2
      assert(canon <= d)
      Seq(d, d + 100000L, d + 200000L).foreach { m =>
        assert(byDoc(m)._2 == canon, s"member $m of chain $d canonicalized to ${byDoc(m)._2}, base to $canon")
        assert(byDoc(m)._3 >= 3L)
      }
    }
  }
}
