package graft

/** Semantic pin for the Heaps-law growth audit (x68): the checkpoint
  * curve and OLS exponent re-derived from the collected corpus in the
  * JVM and compared exactly.
  */
class HeapsFitSpec extends SparkSpec {

  test("x68: growth curve and exponent match a JVM recomputation") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val lo = docs.map(_._1).min
    val hi = docs.map(_._1).max
    val cps = (1 to 10).map(i => (i.toLong, lo + ((hi - lo) * i) / 10))
    val firstDoc = docs.flatMap { case (id, tks) => tks.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).min) }
    val curve = cps.map { case (cp, cpDoc) =>
      val seen = docs.filter(_._1 <= cpDoc)
      (cp, cpDoc, seen.length.toLong,
        seen.map(_._2.length.toLong).sum,
        firstDoc.count(_._2 <= cpDoc).toLong)
    }
    val fx = curve.map { c =>
      (math.floor(math.log(c._4.toDouble) * 1e6 + 0.5).toLong,
        math.floor(math.log(c._5.toDouble) * 1e6 + 0.5).toLong)
    }
    val n = BigInt(fx.length)
    val sx = fx.map(t => BigInt(t._1)).sum
    val sy = fx.map(t => BigInt(t._2)).sum
    val sxy = fx.map(t => BigInt(t._1) * BigInt(t._2)).sum
    val sxx = fx.map(t => BigInt(t._1) * BigInt(t._1)).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val got = SparkEntry.queries("x68_heaps_fit")(spark, sf).collect()
    assert(got.length == 10)
    got.zip(curve).foreach { case (r, (cp, cpDoc, nd, nt, v)) =>
      assert(r.getAs[Long]("checkpoint") == cp)
      assert(r.getAs[Long]("cp_doc") == cpDoc)
      assert(r.getAs[Long]("docs_seen") == nd)
      assert(r.getAs[Long]("tokens_seen") == nt)
      assert(r.getAs[Long]("vocab_size") == v)
      assert(r.getAs[Double]("heaps_slope") == slope)
    }
    // the curve must be monotone: tokens strictly accumulate, vocab
    // never shrinks
    val vs = got.map(_.getAs[Long]("vocab_size"))
    val ts = got.map(_.getAs[Long]("tokens_seen"))
    assert(ts.sliding(2).forall(p => p(0) < p(1)))
    assert(vs.sliding(2).forall(p => p(0) <= p(1)))
  }
}
