package graft

import org.apache.spark.sql.functions._

/** st14: the drained streaming matvec state must equal the batch
  * round-1 computation (same integer arithmetic as PcaPowerSpec).
  */
class StreamingPcaSpec extends SparkSpec {

  private val Scale = 1000000L

  private def tdiv(a: Long, b: Long): Long =
    if (a >= 0) a / b else -((-a) / b)

  test("st14 drained accumulator equals the batch round-1 replay") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * Scale + 0.5d).toLong).toArray)
    val d = vecs.head.length
    val w = Array.fill(d)(0L)
    vecs.foreach { xs =>
      val dt = xs.sum
      var j = 0
      while (j < d) { w(j) += xs(j) * dt; j += 1 }
    }
    val wr = w.map(tdiv(_, Scale))
    val nrm = math.floor(math.sqrt(
      wr.map(x => BigInt(x) * BigInt(x)).sum.toDouble)).toLong
    val v = wr.map(x => if (nrm == 0) 0L else tdiv(x * Scale, nrm))
    val got = streaming.StreamingQueries.defs("st14_stream_pca_matvec")
      .fn(spark, sf).collect()
    assert(got.length == d)
    got.foreach { r =>
      val j = r.getLong(0).toInt - 1
      assert(r.getLong(1) == wr(j) && r.getLong(2) == v(j)
        && r.getLong(3) == nrm, s"dim ${j + 1}")
    }
    spark.catalog.clearCache()
  }
}
