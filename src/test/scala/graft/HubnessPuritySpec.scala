package graft

/** Semantic pins for the kNN hubness audit (x63) and the cluster
  * purity audit (x64).
  *
  * x63 is pinned by graph identities that must hold exactly for a
  * bucket-local top-k graph: every vector's out_degree is
  * min(k, bucket_size - 1) (each node links to its top-k bucket-mates),
  * total in-degree equals total out-degree (every edge has one head and
  * one tail), and is_hub is exactly the in_degree >= 2k predicate.
  *
  * x64 is pinned as a recomposition: purity recomputed in the JVM from
  * x41's own (oracle-checked) cluster assignment joined to the raw
  * labels must reproduce x64 row-for-row — the two queries can never
  * drift because x64 shares x41's cluster spelling.
  */
class HubnessPuritySpec extends SparkSpec {

  private val K = 5 // SimilarityQueries.K (private there; pinned here)

  test("x63: degree identities of the bucket-local kNN graph") {
    val rows = SparkEntry.queries("x63_knn_hubness")(spark, sf).collect()
    val nVec = Tables.embeddings(spark, sf).count()
    assert(rows.length.toLong == nVec)
    val bucketSize = rows.groupBy(_.getAs[Long]("bucket"))
      .map { case (b, g) => b -> g.length }
    rows.foreach { r =>
      val expectedOut =
        math.min(K, bucketSize(r.getAs[Long]("bucket")) - 1).toLong
      assert(r.getAs[Long]("out_degree") == expectedOut)
      assert(r.getAs[Long]("in_degree") >= 0L)
      assert(r.getAs[Boolean]("is_hub") ==
        (r.getAs[Long]("in_degree") >= 2L * K))
    }
    assert(rows.map(_.getAs[Long]("in_degree")).sum ==
      rows.map(_.getAs[Long]("out_degree")).sum)
    // the synthetic corpus must actually exercise the hub predicate
    // somewhere in the degree distribution (non-vacuous audit)
    assert(rows.map(_.getAs[Long]("in_degree")).max > 0L)
  }

  test("x64: purity recomposes exactly from x41 clusters + labels") {
    val labels = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val clusters = SparkEntry
      .queries("x41_embed_dedup_clusters")(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id"))
    val expected = clusters.groupBy(_._2).map { case (cid, members) =>
      val byLabel = members.map(m => labels(m._1)).groupBy(identity)
        .map { case (l, xs) => (l, xs.length.toLong) }
      val (mjLabel, mjCnt) = byLabel.toSeq.sortBy { case (l, c) => (-c, l) }.head
      cid -> ((members.length.toLong, byLabel.size.toLong, mjLabel, mjCnt))
    }
    val got = SparkEntry.queries("x64_cluster_purity")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (size, nLabels, mjLabel, mjCnt) =
        expected(r.getAs[Long]("cluster_id"))
      assert(r.getAs[Long]("cluster_size") == size)
      assert(r.getAs[Long]("n_labels") == nLabels)
      assert(r.getAs[Int]("majority_label") == mjLabel)
      assert(r.getAs[Long]("majority_cnt") == mjCnt)
      assert(r.getAs[Double]("purity") == mjCnt.toDouble / size.toDouble)
    }
  }
}
