package graft

import org.apache.spark.sql.functions._

/** x74 power iteration vs an exact JVM replay of the same integer
  * arithmetic on sf0.001, plus the unit-norm invariant.
  */
class PcaPowerSpec extends SparkSpec {

  private val Scale = 1000000L

  private def tdiv(a: Long, b: Long): Long =
    if (a >= 0) a / b else -((-a) / b)

  test("x74 equals the JVM integer replay on sf0.001") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * Scale + 0.5d).toLong).toArray))
    val d = vecs.head._2.length
    def round(dots: Map[Long, Long]): (Array[Long], Long, Array[Long]) = {
      val w = Array.fill(d)(0L)
      vecs.foreach { case (id, xs) =>
        val dt = dots(id)
        var j = 0
        while (j < d) { w(j) += xs(j) * dt; j += 1 }
      }
      val wr = w.map(tdiv(_, Scale))
      val nrm = math.floor(math.sqrt(
        wr.map(x => BigInt(x) * BigInt(x)).sum.toDouble)).toLong
      val v = wr.map(x => if (nrm == 0) 0L else tdiv(x * Scale, nrm))
      (v, nrm, wr)
    }
    val dot0 = vecs.map { case (id, xs) => id -> xs.sum }.toMap
    val (v1, n1, _) = round(dot0)
    val dot1 = vecs.map { case (id, xs) =>
      id -> tdiv(xs.zip(v1).map { case (x, v) => x * v }.sum, Scale)
    }.toMap
    val (v2, n2, wr2) = round(dot1)
    val got = operators.SimilarityQueries.defs("x74_pca_power")
      .fn(spark, sf).collect()
    assert(got.length == d)
    got.foreach { r =>
      val j = r.getLong(0).toInt - 1
      assert(r.getLong(1) == v2(j), s"v_fp dim ${j + 1}")
      assert(r.getLong(2) == wr2(j), s"w_fp dim ${j + 1}")
      assert(r.getLong(3) == n1 && r.getLong(4) == n2)
    }
    // the normalized vector has (scaled) unit norm up to rounding:
    // each component loses < 1 unit to truncation
    val norm2 = v2.map(x => BigInt(x) * BigInt(x)).sum
    val unit = BigInt(Scale) * BigInt(Scale)
    assert((norm2 - unit).abs < BigInt(4L * Scale * d),
      s"norm drifted: $norm2 vs $unit")
    spark.catalog.clearCache()
  }
}
