package graft

/** The quality contract of the IVF path: nprobe search scans only 4 of 64
  * trained buckets yet must keep most of the true neighbors. Recall is
  * measured against the exact brute-force top-k on the same corpus
  * (0.70 mean at this SF when pinned; the floor leaves headroom for
  * testdata regeneration, not for regressions to near-random).
  */
class IvfRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("nprobe IVF search recalls >= 50% of brute-force neighbors") {
    def sets(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, dir)
        .select("q_id", "neighbor_id").collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = sets("x09_ann_bruteforce")
    val ivf = sets("x12_ann_ivf_search")
    spark.catalog.clearCache()
    val recalls = exact.map { case (q, bf) =>
      bf.intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / bf.size
    }
    val mean = recalls.sum / recalls.size
    assert(exact.size == 8, s"expected 8 probe queries, got ${exact.size}")
    assert(mean >= 0.5, f"mean recall@5 $mean%.2f < 0.5 " +
      s"(per-query: ${recalls.toSeq.sorted.mkString(", ")})")
  }
}
