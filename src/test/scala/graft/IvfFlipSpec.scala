package graft

import org.apache.spark.sql.functions._

/** Pins the automatic broadcast→shuffle flip in the IVF routers
  * (corpus→bucket assignment and probe routing): below
  * `BroadcastCentroidLimit` both fold over the broadcast packed
  * centroid row, past it they run the cartesian + key-partitioned
  * argmax / per-probe window spelling — and BOTH paths must produce
  * row-identical assignments and probed buckets, because the flip is a
  * physical-plan decision only (the GraphFlipSpec discipline applied to
  * the similarity router). Forcing `flipAt = 0` exercises the shuffle
  * path on the small fixture, which the production threshold would
  * never select there.
  */
class IvfFlipSpec extends SparkSpec {
  import operators.SimilarityQueries._

  /** AQE would convert the unhinted tiny joins back to broadcast; the
    * flip exists to produce a genuine non-broadcast exchange shape, so
    * disable auto-broadcast while the shuffle path runs (the
    * GraphFlipSpec helper).
    */
  private def withoutAutoBroadcast[T](body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }

  test("bucket assignment is row-identical on both router paths, " +
      "ties included") {
    val e = quantizedCached(spark, sf)
    val cent = trainedCentroids(e)
    def rows(flipAt: Long) =
      assignedBuckets(e, cent, flipAt)
        .select("vec_id", "bucket", "centroid_cos")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val bc = rows(Long.MaxValue)
    val sh = withoutAutoBroadcast(rows(0L))
    spark.catalog.clearCache()
    assert(bc.nonEmpty)
    assert(bc == sh)
  }

  test("probe routing yields the identical bucket set per probe on " +
      "both router paths") {
    val e = quantizedCached(spark, sf)
    val cent = trainedCentroids(e)
    val probes = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("qe").as("q_qe"),
        col("qn").as("q_qn"))
    def rows(flipAt: Long) =
      probeBuckets(probes, cent, flipAt)
        .select("q_id", "bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val bc = rows(Long.MaxValue)
    val sh = withoutAutoBroadcast(rows(0L))
    spark.catalog.clearCache()
    assert(bc.nonEmpty)
    assert(bc == sh)
  }

  test("the zero vector routes to the argmax tie-break bucket on both " +
      "paths (the NaN-free cosine contract)") {
    import spark.implicits._
    val e = quantizedCached(spark, sf)
    val cent = trainedCentroids(e)
    // a dead (all-zero) vector: sparkCos defines its cosine as 0 against
    // every centroid, so both paths must pick the LOWEST centroid id
    val dead = Seq((999999L, Seq.fill(64)(0L), 0L))
      .toDF("vec_id", "qe", "qn")
    val minCid = cent.agg(min("c_id")).head().getLong(0)
    def bucketOf(flipAt: Long) =
      assignedBuckets(dead, cent, flipAt)
        .select("bucket").head().getLong(0)
    val bc = bucketOf(Long.MaxValue)
    val sh = withoutAutoBroadcast(bucketOf(0L))
    spark.catalog.clearCache()
    assert(bc == minCid, s"broadcast path picked $bc, expected $minCid")
    assert(sh == minCid, s"shuffle path picked $sh, expected $minCid")
  }
}
