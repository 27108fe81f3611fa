package graft

import org.apache.spark.sql.functions._

/** lshStarEdges' contract: identical connected components to the full
  * band-collision pair list (every bucket is a clique, so bucket-min
  * hub edges preserve connectivity exactly), at k−1 instead of
  * k(k−1)/2 edges per bucket.
  */
class StarEdgesSpec extends SparkSpec {

  test("star edges yield the same components as the pair list (sf0.001)") {
    val d = sf
    val pairCand = operators.DedupQueries.minhashCandidates(spark, d)
    val docs = Tables.documents(spark, d).select(col("doc_id"))
    val viaPairs = operators.Components
      .connectedComponents(pairCand, "doc_a", "doc_b", docs, "doc_id", 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaStars = SparkEntry.queries("x14_dedup_clusters")(spark, d)
      .select(col("doc_id"), col("cluster_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaStars == viaPairs)
  }
}
