package graft

/** Semantic pin for the Zipf power-law audit (x62): the per-language
  * OLS sums and slope re-derived from scratch in the JVM — term counts
  * via a plain groupBy on the collected corpus, ranks by (cnt desc,
  * term), logs fixed-pointed exactly as the query spells them, sums in
  * BigInt — and compared exactly (the slope is one division of exact
  * integers, so == holds).
  */
class ZipfFitSpec extends SparkSpec {

  test("x62: OLS sums and slope match a BigInt recomputation") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, g) =>
      val counts = g.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (t, xs) => (t, xs.length.toLong) }
      val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(100)
      val fx = ranked.zipWithIndex.map { case ((_, c), i) =>
        (math.floor(math.log((i + 1).toDouble) * 1e6 + 0.5).toLong,
          math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong)
      }
      val n = BigInt(fx.length)
      val sx = fx.map(t => BigInt(t._1)).sum
      val sy = fx.map(t => BigInt(t._2)).sum
      val sxy = fx.map(t => BigInt(t._1) * BigInt(t._2)).sum
      val sxx = fx.map(t => BigInt(t._1) * BigInt(t._1)).sum
      lang -> ((n, sx, sy, sxy, sxx,
        (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble))
    }
    val got = SparkEntry.queries("x62_zipf_fit")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, sx, sy, sxy, sxx, slope) = expected(r.getAs[String]("lang"))
      assert(BigInt(r.getAs[Long]("n_terms")) == n)
      assert(BigInt(r.getAs[Long]("sx")) == sx)
      assert(BigInt(r.getAs[Long]("sy")) == sy)
      assert(BigInt(r.getAs[Long]("sxy")) == sxy)
      assert(BigInt(r.getAs[Long]("sxx")) == sxx)
      assert(r.getAs[Double]("zipf_slope") == slope)
      // a frequency-ranked vocab can only slope downward
      assert(r.getAs[Double]("zipf_slope") < 0.0)
    }
  }
}
