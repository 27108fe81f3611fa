package graft

import java.nio.file.Files

import graft.operators.SimilarityQueries
import org.apache.spark.sql.functions._

/** The embedding-side skew levers the r4 verdict asked for:
  *
  *   1. `bucketCap` ([[SimilarityQueries.cappedByBucket]]) on an
  *      adversarial hot bucket — 100 identical vectors, so k-means
  *      collapses every vector into bucket 0 and the uncapped pair join
  *      is the full C(100,2) quadratic. The cap must bound it to
  *      C(cap,2), keep the surviving set deterministic (lowest vec_ids),
  *      and never invent pairs.
  *   2. the √n centroid budget in `initCentroids` — fixed NCentroids
  *      means bucket size grows linearly with the corpus (quadratic pair
  *      work); the budget must switch to ⌈√n⌉ once that exceeds the
  *      64-centroid floor, and stay at the floor below it (so the test-SF
  *      results are byte-identical to the historical fixed-64 spelling).
  */
class EmbedBucketCapSpec extends SparkSpec {

  import spark.implicits._

  // one-bucket corpus: 100 copies of the same direction → every pair has
  // cos = 1 ≥ tau, all in bucket 0 (identical centroids tie-break to the
  // lowest c_id)
  private lazy val hotDir: String = {
    val dir = Files.createTempDirectory("graft-hotbucket").toFile
    dir.deleteOnExit()
    (0L until 100L).map(id => (id, Array(1.0f, 0.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir.toString
  }

  test("uncapped hot bucket emits the full quadratic pair set") {
    val pairs = SimilarityQueries.embedNearDup(spark, hotDir).collect()
    assert(pairs.length == 100 * 99 / 2)
  }

  test("bucketCap bounds the hot bucket to C(cap,2) lowest-id pairs") {
    val pairs = SimilarityQueries
      .embedNearDup(spark, hotDir, bucketCap = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size == 10 * 9 / 2)
    assert(pairs.forall { case (a, b) => a < 10 && b < 10 })
    // subset of the exact join (a cap can only remove pairs)
    val exact = SimilarityQueries.embedNearDup(spark, hotDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(exact))
  }

  test("capped-out vectors fall back to singleton clusters") {
    val path = Files.createTempDirectory("graft-capcluster").toFile
    path.deleteOnExit()
    SimilarityQueries.buildClusters(spark, hotDir, s"$path/clusters",
      bucketCap = Some(10))
    val rows = SimilarityQueries.clustersFrom(spark, s"$path/clusters")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size == 100)
    (0L until 10L).foreach(id => assert(rows(id) == 0L))   // one cluster
    (10L until 100L).foreach(id => assert(rows(id) == id)) // singletons
  }

  test("knnHubness keeps capped-out vectors visible at zero degree") {
    val deg = SimilarityQueries
      .knnHubness(spark, hotDir, bucketCap = Some(10))
      .select("vec_id", "out_degree").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg.size == 100)            // full vertex set, not the capped one
    assert(deg.values.sum == 10L * 5L) // each capped vector emits K edges
    (10L until 100L).foreach(id => assert(deg(id) == 0L))
  }

  test("clusterSilhouette keeps capped-out vectors visible at s = 0") {
    val rows = SimilarityQueries
      .clusterSilhouette(spark, hotDir, bucketCap = Some(10))
      .collect()
    assert(rows.length == 100)         // full membership, not the capped set
    rows.foreach { r =>
      assert(r.getDouble(4) == 0.0)    // one cluster of duplicates: s = 0
      val id = r.getLong(0)
      // capped-in vectors have a defined (zero-distance) a; capped-out
      // vectors generated no pairs at all, so a is the NULL convention
      if (id < 10L) assert(!r.isNullAt(2) && r.getLong(2) == 0L)
      else assert(r.isNullAt(2))
      assert(r.isNullAt(3))            // single cluster → b undefined for all
    }
  }

  test("cslsRescore drops capped-out probes like singleton-bucket probes") {
    val byProbe = SimilarityQueries
      .cslsRescore(spark, hotDir, bucketCap = Some(4))
      .collect().groupBy(_.getLong(0))
    // probes 0-3 survive the cap and see the 3 other capped-in duplicates;
    // probes 4-7 are capped out of pair generation → no retrieval rows
    assert(byProbe.keySet == (0L until 4L).toSet)
    byProbe.values.foreach { rs =>
      assert(rs.length == 3)
      // identical vectors: cos = r(x) = r(y) = 10^6 micro → csls exactly 0
      rs.foreach(r => assert(r.getLong(3) == 1000000L && r.getLong(4) == 0L))
    }
  }

  test("centroid budget: 64-floor below 4096 vectors, ceil(sqrt(n)) above") {
    def quant(n: Long) =
      spark.range(n).select(col("id").as("vec_id"),
        array(lit(1L)).as("qe"), lit(1L).as("qn"))
    assert(SimilarityQueries.initCentroids(quant(100L)).count() == 64L)
    assert(SimilarityQueries.initCentroids(quant(2000L)).count() == 64L)
    assert(SimilarityQueries.initCentroids(quant(8100L)).count() == 90L)
    assert(SimilarityQueries.initCentroids(quant(8101L)).count() == 91L)
  }
}
