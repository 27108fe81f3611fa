package graft

/** Semantic pins for the repetition signals (x57) and the curation funnel
  * (x58) beyond the driver's DuckDB hash-compare: x57's gram rollup is
  * recomputed brute-force in the JVM per doc; x58's survival chain is
  * pinned monotone and re-derived from the per-doc flag frame.
  */
class RepetitionSpec extends SparkSpec {

  private def bruteGrams(toks: Array[String], k: Int): Map[String, Int] =
    toks.sliding(k).filter(_.length == k).map(_.mkString(" "))
      .toSeq.groupBy(identity).map { case (g, occ) => g -> occ.size }

  test("x57: gram rollup matches a JVM brute-force recount") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ')).toMap
    val rows = SparkEntry.queries("x57_repetition_stats")(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id"))
      val (bg, tg) = (bruteGrams(toks, 2), bruteGrams(toks, 3))
      assert(r.getAs[Long]("n_tokens") == toks.length)
      if (toks.length >= 2) {
        assert(r.getAs[Long]("top2_cnt") == bg.values.max)
        assert(r.getAs[Long]("n_2grams") == toks.length - 1)
        assert(r.getAs[Long]("dst_2grams") == bg.size)
        val top2f = bg.values.max.toDouble / (toks.length - 1)
        val dup2f = (toks.length - 1 - bg.size).toDouble / (toks.length - 1)
        assert(r.getAs[Double]("top_2gram_frac") == top2f)
        assert(r.getAs[Boolean]("repetitive") ==
          (top2f > 0.08 || dup2f > 0.08))
      }
      if (toks.length >= 3)
        assert(r.getAs[Double]("top_3gram_frac") ==
          tg.values.max.toDouble / (toks.length - 2))
    }
    // the flag must actually fire somewhere and not everywhere
    val flags = rows.map(_.getAs[Boolean]("repetitive"))
    assert(flags.contains(true) && flags.contains(false))
  }

  test("x58: funnel is monotone, anchored at the corpus, share-consistent") {
    val rows = SparkEntry.queries("x58_filter_funnel")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq == Seq(
      "0_all", "1_length", "2_lang", "3_quality", "4_repetition"))
    val docs = rows.map(_.getAs[Long]("docs"))
    val toks = rows.map(_.getAs[Long]("tokens"))
    // stage 0 is the whole corpus
    assert(docs.head == Tables.documents(spark, sf).count())
    // cumulative conjunction can only shrink both counters
    docs.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    toks.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    // each stage cuts something at this SF (thresholds are non-vacuous)
    assert(docs.last < docs.head)
    // shares are docs / corpus-size exactly
    rows.foreach { r =>
      assert(r.getAs[Double]("doc_share") ==
        r.getAs[Long]("docs").toDouble / docs.head)
    }
  }
}
