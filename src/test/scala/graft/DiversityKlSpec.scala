package graft

/** Semantic pins for the per-source KL drift audit (x66) and the
  * n-gram diversity audit (x67), both re-derived from scratch in the
  * JVM and compared exactly (each query's float output is a single
  * division of exact integers; x66's log-ratio uses the same JVM
  * Math.log Spark's `ln` compiles to).
  */
class DiversityKlSpec extends SparkSpec {

  test("x66: KL divergence matches an exact JVM recomputation, and >= 0") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ")))
    val corpus = docs.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => (t, xs.length.toLong) }
    val nAll = corpus.values.sum
    val expected = docs.groupBy(_._1).map { case (src, g) =>
      val counts = g.flatMap(_._2).groupBy(identity)
        .map { case (t, xs) => (t, xs.length.toLong) }
      val nSrc = counts.values.sum
      val klSum = counts.map { case (t, cSt) =>
        cSt * math.floor(math.log(
          (cSt * nAll).toDouble / (corpus(t) * nSrc).toDouble)
          * 1000000 + 0.5).toLong
      }.sum
      src -> ((nSrc, counts.size.toLong, klSum,
        klSum.toDouble / (nSrc.toDouble * 1000000.0)))
    }
    val got = SparkEntry.queries("x66_source_kl")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, terms, klSum, kl) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_tokens") == n)
      assert(r.getAs[Long]("n_terms") == terms)
      assert(r.getAs[Long]("kl_micro_sum") == klSum)
      assert(r.getAs[Double]("kl_nats") == kl)
      // KL is non-negative up to the 1e-6 fixed-point quantization
      assert(r.getAs[Double]("kl_nats") >= -1e-6)
    }
  }

  test("x67: diversity ratios match a JVM n-gram recomputation") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ")))
    val expected = docs.groupBy(_._1).flatMap { case (src, g) =>
      (1 to 3).map { k =>
        val grams = g.flatMap(_._2.sliding(k).filter(_.length == k)
          .map(_.mkString(" ")))
        val counts = grams.groupBy(identity).map(_._2.length.toLong)
        (src, k.toLong) -> ((grams.length.toLong, counts.size.toLong,
          counts.max))
      }
    }
    val got = SparkEntry.queries("x67_ngram_diversity")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (total, distinct, top) =
        expected((r.getAs[String]("source"), r.getAs[Long]("g")))
      assert(r.getAs[Long]("total_grams") == total)
      assert(r.getAs[Long]("distinct_grams") == distinct)
      assert(r.getAs[Long]("top_gram_count") == top)
      assert(r.getAs[Double]("diversity") ==
        distinct.toDouble / total.toDouble)
    }
  }
}
