package graft

/** Cross-query consistency pins for hard-negative mining (x96) — the
  * HubnessPuritySpec discipline: x96 shares x12's candidate spelling
  * and x41's cluster spelling, so its rows must be exactly x12's
  * candidate stream minus the probe's own cluster, re-ranked. Pinned
  * against the DECLARED x41/x12 outputs so the three queries can never
  * silently drift apart.
  */
class HardNegativeSpec extends SparkSpec {

  test("x96: no returned negative shares the probe's x41 cluster, " +
      "ranks are dense and cosine-ordered") {
    val clusters = SparkEntry.queries("x41_embed_dedup_clusters")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    spark.catalog.clearCache()
    val rows = SparkEntry.queries("x96_hard_negatives")(spark, sf).collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val n = r.getAs[Long]("neighbor_id")
      assert(clusters(q) != clusters(n),
        s"probe $q (cluster ${clusters(q)}) was handed its own " +
          s"cluster-mate $n as a negative")
    }
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, g) =>
      val byRank = g.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
        (1L to byRank.length).toSeq, s"probe $q ranks not dense")
      val coss = byRank.map(_.getAs[Double]("cos")).toSeq
      assert(coss == coss.sortBy(-_), s"probe $q not cosine-ordered")
    }
  }

  test("x96: the cluster exclusion actually bites on the driver " +
      "corpus (x96 != x12 somewhere)") {
    def keyset(name: String) =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"))).toSet
    val x12 = keyset("x12_ann_ivf_search")
    spark.catalog.clearCache()
    val x96 = keyset("x96_hard_negatives")
    spark.catalog.clearCache()
    assert(x12 != x96,
      "x96 equals x12 — the near-dup exclusion excluded nothing, " +
        "the test corpus no longer exercises the operator")
  }

  test("x96s: the serve path answers from persisted artifacts with " +
      "frame-identical rows") {
    def frame(name: String) =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSeq
    val self = frame("x96_hard_negatives")
    spark.catalog.clearCache()
    val served = frame("x96s_negatives_serve")
    spark.catalog.clearCache()
    assert(served == self, "served mining drifted from the declared query")
  }
}
