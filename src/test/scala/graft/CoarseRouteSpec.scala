package graft

import org.apache.spark.sql.functions._

/** Two-level coarse→fine routing (x99): the oracle pins the full
  * cross-engine route; this spec pins what the hash can't articulate —
  * the shape contract (NProbe buckets per probe, binary flag,
  * determinism) and the AUDIT column's meaning: `in_flat` must equal
  * membership in an INDEPENDENTLY computed flat top-NProbe (JVM cosine
  * argsort over the trained fine centroids, not the engine's window),
  * and disagreement must actually occur somewhere (a trivially-equal
  * router would make the audit column dead).
  */
class CoarseRouteSpec extends SparkSpec {

  private val NProbe = 4 // mirrors SimilarityQueries.NProbe

  test("x99: four buckets per probe, in_flat equals independent flat " +
      "membership, and the two-level route genuinely diverges") {
    val rows = SparkEntry.queries("x99_ivf_coarse_route")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("bucket"),
        r.getAs[Long]("in_flat")))
    // shape: exactly NProbe rows per probe, flag binary
    rows.groupBy(_._1).foreach { case (q, g) =>
      assert(g.length == NProbe, s"probe $q routed ${g.length} buckets")
    }
    assert(rows.forall(r => r._3 == 0L || r._3 == 1L))

    // independent flat routing: JVM cosine argsort over the trained
    // centroids (same IEEE ops as the engine expression: exact int64
    // dot, one double division)
    import operators.SimilarityQueries.{quantizedCached, trainedCentroids}
    val e = quantizedCached(spark, sf)
    val cent = trainedCentroids(e).collect()
      .map(r => (r.getAs[Long]("c_id"),
        r.getAs[Seq[Long]]("c_qe").toArray, r.getAs[Long]("c_qn")))
    val probes = e.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("qe"), col("qn")).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Long]]("qe").toArray, r.getAs[Long]("qn")))
    def cos(a: Array[Long], an: Long, b: Array[Long], bn: Long): Double =
      if (an == 0L || bn == 0L) 0.0
      else {
        var d = 0L; var i = 0
        while (i < a.length) { d += a(i) * b(i); i += 1 }
        d.toDouble / (math.sqrt(an.toDouble) * math.sqrt(bn.toDouble))
      }
    val flat = probes.map { case (q, qe, qn) =>
      q -> cent.map { case (c, cqe, cqn) => (cos(cqe, cqn, qe, qn), c) }
        .sortBy { case (cs, c) => (-cs, c) }.take(NProbe).map(_._2).toSet
    }.toMap
    spark.catalog.clearCache()
    rows.foreach { case (q, b, f) =>
      assert((f == 1L) == flat(q)(b),
        s"probe $q bucket $b: in_flat=$f but flat membership=${flat(q)(b)}")
    }
    assert(rows.exists(_._3 == 0L),
      "two-level routing never diverged from flat — the audit is dead")
    assert(rows.count(_._3 == 1L) > rows.length / 2,
      "two-level routing agrees on under half the buckets — coarse " +
        "grouping is failing to preserve neighborhoods")
  }
}
