package graft

/** x14's fixed unroll hash-matches its oracle by construction; what it
  * must additionally be is CONVERGED on real data — the deepest node in
  * this corpus sits 15 hops from its component's min label, within the
  * ≥ 2^5 − 2 = 30-hop reach of 5 propagate+shortcut rounds. Converged
  * means: no LSH edge crosses clusters, and every cluster is labeled by
  * its minimum member.
  */
class DedupClustersSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("label propagation reaches the fixpoint on the corpus") {
    val clusters = SparkEntry.queries("x14_dedup_clusters")(spark, dir)
      .select("doc_id", "cluster_id").cache()
    val label = clusters.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SparkEntry.queries("x06_dedup_minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    // every near-dup edge is intra-cluster
    val crossing = pairs.filter { case (a, b) => label(a) != label(b) }
    assert(crossing.isEmpty, s"${crossing.length} unmerged edges, " +
      s"e.g. ${crossing.take(3).mkString(", ")}")
    // each cluster's id is its minimum member (true min-label fixpoint)
    label.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid min=${members.keys.min}")
    }
    // sanity: the corpus really exercises depth (one big component)
    assert(label.groupBy(_._2).values.map(_.size).max >= 100)
  }
}
