package graft

/** Semantic pin for BM25 retrieval (x65): the whole ranking re-derived
  * from scratch in the JVM — tokenization, per-language stats, probe
  * selection, the integer-rational score in the query's exact
  * association order — and compared row-for-row, score included
  * (every operand is < 2^53 so the doubles are exact, and Spark's `ln`
  * is the same JVM `Math.log`).
  */
class Bm25Spec extends SparkSpec {

  private val ProbeM = 10
  private val TopDocs = 5

  test("x65s: serving from the persisted inverted index equals the " +
      "self-contained x65") {
    def rows(name: String) = SparkEntry.queries(name)(spark, sf)
      .collect().map(_.toSeq).toSeq
    val declared = rows("x65_bm25_rank")
    spark.catalog.clearCache()
    assert(rows("x65s_bm25_serve") == declared,
      "serve twin drifted from x65")
    spark.catalog.clearCache()
  }

  test("x65: full JVM recomputation reproduces the ranking and scores") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("lang", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split(" ")))
    val expected = docs.groupBy(_._1).flatMap { case (lang, g) =>
      val dl = g.map(d => d._2 -> d._3.length.toLong).toMap
      val nDocs = g.length.toLong
      val sumDl = dl.values.sum
      val counts = g.flatMap(_._3).groupBy(identity)
        .map { case (t, xs) => (t, xs.length.toLong) }
      val probe = counts.toSeq.sortBy { case (t, c) => (-c, t) }
        .take(ProbeM).map(_._1)
      probe.flatMap { term =>
        val tf = g.map(d => d._2 -> d._3.count(_ == term).toLong)
          .filter(_._2 > 0L).toMap
        val df = tf.size.toLong
        val idfMicro = math.floor(math.log(
          ((nDocs - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
          * 1000000 + 0.5).toLong
        val scored = tf.toSeq.map { case (id, t) =>
          val num = idfMicro * 22L * t * sumDl
          val den = 10L * sumDl * t + 3L * sumDl + 9L * dl(id) * nDocs
          (id, t, num.toDouble / den.toDouble / 1000000.0)
        }
        scored.sortBy { case (id, _, sc) => (-sc, id) }
          .take(TopDocs).zipWithIndex.map { case ((id, t, sc), i) =>
            (lang, term, i + 1L) -> ((id, t, dl(id), idfMicro, sc))
          }
      }
    }
    val got = SparkEntry.queries("x65_bm25_rank")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (id, tf, dlv, idf, score) = expected((r.getAs[String]("lang"),
        r.getAs[String]("term"), r.getAs[Long]("rank")))
      assert(r.getAs[Long]("doc_id") == id)
      assert(r.getAs[Long]("tf") == tf)
      assert(r.getAs[Long]("dl") == dlv)
      assert(r.getAs[Long]("idf_micro") == idf)
      assert(r.getAs[Double]("score") == score)
    }
  }
}
