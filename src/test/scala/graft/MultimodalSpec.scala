package graft

/** Multimodal plumbing (mm01-mm03): typed decode coverage, frame-sample
  * stride, and the pHash near-dup contract — invariants the oracle hash
  * can't articulate.
  */
class MultimodalSpec extends SparkSpec {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("mm01: one feature row per document, md5 matches the payload") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val ft = rows("mm01_binary_features")
    assert(ft.length == docs.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    ft.take(25).foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val hex = md.digest(text.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("content_md5") == hex)
      assert(r.getAs[Long]("n_bytes") == text.getBytes("UTF-8").length.toLong)
    }
  }

  test("mm02: frame indices stride by 4 from 0, bounded by n_frames") {
    val nf = rows("mm01_binary_features")
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_frames")).toMap
    rows("mm02_frame_sample").groupBy(_.getAs[Long]("doc_id"))
      .foreach { case (d, g) =>
        val idx = g.map(_.getAs[Long]("frame_idx")).sorted.toSeq
        assert(idx == (0L until nf(d) by 4L).toSeq, s"doc $d stride")
        assert(g.forall(r => r.getAs[Long]("thumb_w") <= 224L &&
          r.getAs[Long]("thumb_h") <= 224L))
      }
  }

  test("mm03: pairs are ordered and deduped, hamming in [0,3], and a " +
    "hamming-0 pair shares its 64-codepoint payload lead") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def lead64(s: String): String = {
      // first 64 CODE POINTS (the hash's slicing unit), not chars
      val n = s.codePointCount(0, s.length)
      s.substring(0, s.offsetByCodePoints(0, math.min(64, n)))
    }
    val prs = rows("mm03_phash_neardup")
    // expectation derived from the corpus, not assumed of it: every
    // lead-sharing pair must surface at hamming 0, so the query is
    // empty iff the (possibly regenerated) corpus has no such pairs
    val leadPairs = docs.toSeq.groupBy { case (_, t) => lead64(t) }
      .values.filter(_.size > 1)
      .flatMap(g => g.map(_._1).sorted.combinations(2).map(c => (c(0), c(1))))
      .toSet
    val zeroPairs = prs.filter(_.getAs[Long]("hamming") == 0L)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(zeroPairs == leadPairs,
      s"hamming-0 pairs != lead-sharing pairs (${zeroPairs.size} vs ${leadPairs.size})")
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    prs.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val hm = r.getAs[Long]("hamming")
      assert(a < b, s"pair ($a,$b) not ordered")
      assert(seen.add((a, b)), s"pair ($a,$b) duplicated")
      assert(hm >= 0L && hm <= 3L)
    }
  }

  test("mm04: VAD stats match an independent per-doc reference " +
    "(window energy, islands, longest run)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // independent reference: same spec, different spelling (per-doc
    // in-memory scan instead of the engine's dataset plumbing)
    def ref(text: String): Option[(Long, Long, Long, Long)] = {
      if (text.isEmpty) None
      else {
        val voiced = text.codePoints().toArray.grouped(16).map { g =>
          g.map(c => c.toLong * c).sum >= 5000L * g.length
        }.toVector
        val runs = collection.mutable.ArrayBuffer[Long]()
        var cur = 0L
        for (v <- voiced) {
          if (v) cur += 1
          else if (cur > 0) { runs += cur; cur = 0 }
        }
        if (cur > 0) runs += cur
        Some((voiced.length.toLong, voiced.count(identity).toLong,
          runs.length.toLong, if (runs.isEmpty) 0L else runs.max))
      }
    }
    val got = rows("mm04_audio_vad").map { r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_windows"),
        r.getAs[Long]("n_voiced"), r.getAs[Long]("n_segments"),
        r.getAs[Long]("max_run"))
    }.toMap
    val want = docs.flatMap { case (id, t) => ref(t).map(id -> _) }
    assert(got.keySet == want.keySet,
      s"doc coverage ${got.size} vs ${want.size}")
    for ((id, w) <- want)
      assert(got(id) == w, s"doc $id: got ${got(id)} want $w")
  }
}
