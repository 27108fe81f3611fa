package graft

import java.security.MessageDigest

/** Semantic pins for the embedding dimension stats (x59) and priority
  * sampling (x60): both re-derived independently in the JVM — x59's
  * moments from the raw vectors with BigInt arithmetic, x60's kept set
  * from a from-scratch md5 priority ranking.
  */
class DimStatsSampleSpec extends SparkSpec {

  test("x59: per-dim moments match a BigInt recomputation from raw vectors") {
    val vecs = Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val rows = SparkEntry.queries("x59_embed_dim_stats")(spark, sf).collect()
    assert(rows.length == vecs.head.length)
    rows.foreach { r =>
      val d = r.getAs[Long]("dim").toInt - 1
      val xf = vecs.map(v => math.floor(v(d).toDouble * 1e6 + 0.5).toLong)
      assert(r.getAs[Long]("n") == vecs.length)
      assert(r.getAs[Long]("sx") == xf.sum)
      assert(BigInt(r.getAs[String]("sxx")) ==
        xf.map(x => BigInt(x) * BigInt(x)).sum)
      assert(r.getAs[Long]("min_micro") == xf.min)
      assert(r.getAs[Long]("max_micro") == xf.max)
      // variance recomputed through the same association order
      val n = vecs.length
      val num = (BigInt(n) * xf.map(x => BigInt(x) * BigInt(x)).sum
        - BigInt(xf.sum) * BigInt(xf.sum)).toDouble
      assert(r.getAs[Double]("var_pop") ==
        num / (n.toDouble * n.toDouble * 1e12))
      assert(r.getAs[Double]("var_pop") >= 0.0)
    }
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("x60: kept set is exactly the top-SampleK priorities per source") {
    val k = operators.PipelineQueries.SampleK
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "doc_id",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val prio = docs.map { case (src, id, w) =>
      val h = java.lang.Long.parseLong(md5hex(s"ps|$id").take(15), 16)
      (src, id, w, w.toDouble / ((h + 1).toDouble / 1152921504606846976.0))
    }
    val expected = prio.groupBy(_._1).flatMap { case (src, g) =>
      val ranked = g.sortBy(t => (-t._4, t._2))
      val tau = if (ranked.length >= k + 1) Some(ranked(k)._4) else None
      ranked.take(k).zipWithIndex.toSeq.map { case ((_, id, w, p), i) =>
        (src, id) -> ((i + 1L, p, tau,
          tau.fold(w.toDouble)(t => math.max(w.toDouble, t))))
      }
    }.toMap
    val got = SparkEntry.queries("x60_priority_sample")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (rk, p, tau, est) =
        expected((r.getAs[String]("source"), r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("rk") == rk)
      assert(r.getAs[Double]("priority") == p)
      assert(Option(r.getAs[Any]("tau")).map(_.asInstanceOf[Double]) == tau)
      assert(r.getAs[Double]("est_tokens") == est)
    }
  }
}
