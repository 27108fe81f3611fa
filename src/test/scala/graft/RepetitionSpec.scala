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
    // the flag must actually fire somewhere and not everywhere — read
    // through Option so NULL (short docs) can't masquerade as false
    val flags = rows.flatMap(r =>
      Option(r.getAs[Any]("repetitive")).map(_.asInstanceOf[Boolean]))
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

  test("row-local streaming flags == batch rollup flags, doc by doc") {
    // the st12 ingest gate computes f4 via per-row HOFs; the batch
    // funnel via explode + rollup — the two spellings must agree on
    // every doc (and on every shared intermediate count)
    val batch = operators.TextQueries.curationFlags(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("f1"), r.getAs[Boolean]("f2"),
          r.getAs[Boolean]("f3"), r.getAs[Boolean]("f4")))
      .toMap
    val local = operators.TextQueries
      .rowLocalFlags(Tables.documents(spark, sf)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("f1"), r.getAs[Boolean]("f2"),
          r.getAs[Boolean]("f3"), r.getAs[Boolean]("f4")))
      .toMap
    assert(local.keySet == batch.keySet)
    local.foreach { case (id, flags) =>
      assert(flags == batch(id), s"doc $id")
    }
  }

  test("st12 drained gate == batch flags rolled up per source") {
    val flags = operators.TextQueries.curationFlags(spark, sf).collect()
      .map(r => (r.getAs[String]("source"),
        r.getAs[Int]("n_tokens").toLong,
        r.getAs[Boolean]("f1") && r.getAs[Boolean]("f2") &&
          r.getAs[Boolean]("f3") && r.getAs[Boolean]("f4")))
    val expected = flags.groupBy(_._1).map { case (src, g) =>
      src -> ((g.size.toLong, g.count(_._3).toLong,
        g.map(_._2).sum, g.filter(_._3).map(_._2).sum))
    }
    val got = SparkEntry.queries("st12_stream_curation_gate")(spark, sf)
      .collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (di, dk, ti, tk) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("docs_in") == di)
      assert(r.getAs[Long]("docs_kept") == dk)
      assert(r.getAs[Long]("tokens_in") == ti)
      assert(r.getAs[Long]("tokens_kept") == tk)
    }
  }

  test("corpus_curate == composition of its verified stage queries") {
    // flags re-derived from the standalone queries' own outputs: f1/f3
    // from x02, f2 from x03's hit counts, f4 from x57's flag
    val q02 = SparkEntry.queries("x02_text_quality")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("quality_score")))
      .toMap
    val q03 = SparkEntry.queries("x03_lang_id")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("h_en") + r.getAs[Long]("h_es") +
          r.getAs[Long]("h_de") + r.getAs[Long]("h_fr")))
      .toMap
    val q57 = SparkEntry.queries("x57_repetition_stats")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[Any]("repetitive"))
          .exists(_.asInstanceOf[Boolean]))
      .toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val kept = docs.filter { case (id, _, _, _) =>
      val (n, q) = q02(id)
      n >= 20 && n <= 1000 && q03(id) > 0 && q >= 25d && !q57(id)
    }
    val deduped = kept
      .groupBy { case (_, _, _, t) =>
        md5hex(t.trim.toLowerCase.replaceAll(" +", " "))
      }
      .values.map(_.minBy(_._1)).toSeq
    val sampled = deduped.groupBy(_._3).values.flatMap { g =>
      g.sortBy { case (id, _, _, _) =>
        val h = java.lang.Long.parseLong(md5hex(s"ps|$id").take(15), 16)
        val prio = q02(id)._1.toDouble /
          ((h + 1).toDouble / 1152921504606846976.0)
        (-prio, id)
      }.take(operators.PipelineQueries.SampleK)
    }.toSeq
    val expected = sampled.groupBy(_._2).toSeq.flatMap { case (lang, g) =>
      val ordered = g.sortBy(_._1)
      var offset = 0L
      ordered.map { case (id, _, _, _) =>
        val bin = offset / 2048L
        offset += q02(id)._1
        (lang, bin, id)
      }
    }.groupBy { case (lang, bin, _) => (lang, bin) }
      .map { case ((lang, bin), g) =>
        (lang, bin) -> ((g.size.toLong,
          g.map { case (_, _, id) => q02(id)._1 }.sum,
          g.map(_._3).min, g.map(_._3).max))
      }
    val got = SparkEntry.queries("corpus_curate")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[Long]("bin_id"))
      val (nd, tt, fd, ld) = expected(key)
      assert(r.getAs[Long]("n_docs") == nd, s"$key n_docs")
      assert(r.getAs[Long]("total_tokens") == tt, s"$key total_tokens")
      assert(r.getAs[Long]("first_doc") == fd && r.getAs[Long]("last_doc") == ld, s"$key doc range")
    }
  }
}
