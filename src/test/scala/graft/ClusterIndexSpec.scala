package graft

/** The persisted-cluster serve path (buildClusters → clustersFrom /
  * purityFrom) must reproduce the in-query x41/x64 results exactly —
  * the IvfIndexSpec argument applied to the semantic-dedup chain.
  */
class ClusterIndexSpec extends SparkSpec {

  test("persisted clusters reproduce x41 rows and x64 purity exactly") {
    val path = java.nio.file.Files
      .createTempDirectory("clidx").toString + "/clusters"
    operators.SimilarityQueries.buildClusters(spark, sf, path)
    spark.catalog.clearCache()
    val declared = operators.SimilarityQueries
      .defs("x41_embed_dedup_clusters").fn(spark, sf)
      .select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    val served = operators.SimilarityQueries.clustersFrom(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served == declared)
    val purityDeclared = operators.SimilarityQueries
      .defs("x64_cluster_purity").fn(spark, sf).collect().toSeq
    spark.catalog.clearCache()
    val purityServed = operators.SimilarityQueries
      .purityFrom(spark, sf, path).collect().toSeq
    assert(purityServed == purityDeclared)
    spark.catalog.clearCache()
  }
}
