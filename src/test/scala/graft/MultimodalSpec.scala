package graft

/** Multimodal plumbing (mm01-mm03): typed decode coverage, frame-sample
  * stride, and the pHash near-dup contract — invariants the oracle hash
  * can't articulate.
  */
class MultimodalSpec extends SparkSpec {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("mm01: one decoded-metadata row per document — container kind " +
      "from the magic, dims from the parsed header, plane stats match " +
      "an independent generator replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val ft = rows("mm01_binary_features")
    assert(ft.length == docs.size)
    ft.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("container") ==
        (if (id % 2 == 0) "bmp" else "png"), s"doc $id container")
      assert(r.getAs[Long]("width") == 32L &&
        r.getAs[Long]("height") == 32L &&
        r.getAs[Long]("n_pixels") == 1024L, s"doc $id dims")
    }
    // plane stats against the independent replay (refPlane, the
    // functional spelling the pHash tests already use): a decode bug
    // in either container path shifts the sum
    ft.take(25).foreach { r =>
      val plane = refPlane(docs(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("plane_sum") == plane.sum,
        s"doc ${r.getAs[Long]("doc_id")} plane_sum")
      assert(r.getAs[Long]("first_px") == plane.head,
        s"doc ${r.getAs[Long]("doc_id")} first_px")
    }
  }

  test("mm02: frame indices stride by 4 from 0, bounded by the decoded " +
      "clip's window count; thumbs are the parsed dims clamped to 224") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val nf = docs.map { case (id, t) =>
      id -> (t.codePointCount(0, t.length).toLong + 15L) / 16L }
    val byDoc = rows("mm02_frame_sample").groupBy(_.getAs[Long]("doc_id"))
    // every non-empty doc appears; zero-sample clips contribute nothing
    assert(byDoc.keySet == nf.filter(_._2 > 0L).keySet)
    byDoc.foreach { case (d, g) =>
      val idx = g.map(_.getAs[Long]("frame_idx")).sorted.toSeq
      assert(idx == (0L until nf(d) by 4L).toSeq, s"doc $d stride")
      assert(g.forall(r => r.getAs[Long]("thumb_w") == 32L &&
        r.getAs[Long]("thumb_h") == 32L), s"doc $d thumbs")
    }
  }

  // ── independent pHash replay (functional spelling vs the engine's
  // imperative loops; cosine table recomputed from the formula, not
  // shared) used by the mm03/mm03c tests below.
  private lazy val refCos: IndexedSeq[IndexedSeq[Long]] =
    for (k <- 0 until 8) yield
      for (n <- 0 until 32) yield
        Math.round(math.cos(math.Pi * (2 * n + 1) * k / 64.0) * 16384.0)

  private def refPlane(text: String): IndexedSeq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val ncp = text.codePointCount(0, text.length)
    val nc = math.max(1, (ncp + 15) / 16)
    (0 until 64).flatMap { j =>
      val from = (j % nc) * 16
      val chunk = if (from >= ncp) "" else {
        val st = text.offsetByCodePoints(0, from)
        text.substring(st,
          text.offsetByCodePoints(st, math.min(16, ncp - from)))
      }
      md.reset()
      md.digest((chunk + "#" + j).getBytes("UTF-8")).take(16)
        .map(b => (b & 0xff).toLong)
    }
  }

  private def refHash(pix: IndexedSeq[Long]): Long = {
    val t = for (m <- 0 until 32) yield
      for (v <- 0 until 8) yield
        (0 until 32).map(n => pix(m * 32 + n) * refCos(v)(n)).sum
    val x = for (u <- 0 until 8) yield
      for (v <- 0 until 8) yield
        (0 until 32).map(m => t(m)(v) * refCos(u)(m)).sum
    val s = (1 until 64).map(k => x(k / 8)(k % 8)).sum
    (1 until 64).foldLeft(0L) { (h, k) =>
      if (x(k / 8)(k % 8) * 63L > s) h | (1L << (k - 1)) else h
    }
  }

  /** Band-then-verify replay over the whole corpus; `cap` drops hot
    * (band, value) buckets from both sides like the engine's bandCap.
    */
  private def refPairs(docs: Map[Long, String],
      cap: Option[Int]): Set[(Long, Long, Long)] = {
    val h = docs.map { case (id, t) => id -> refHash(refPlane(t)) }
    val buckets = h.toSeq
      .flatMap { case (id, ph) =>
        (0 until 4).map(bi => (bi.toLong, (ph >> (bi * 16)) & 65535L) -> id)
      }
      .groupBy(_._1).values.map(_.map(_._2))
      .filter(g => cap.forall(g.size <= _))
    buckets.flatMap(g => g.sorted.combinations(2).map(c => (c(0), c(1))))
      .toSet
      .map { p: (Long, Long) =>
        (p._1, p._2, java.lang.Long.bitCount(h(p._1) ^ h(p._2)).toLong)
      }
      .filter(_._3 <= 7L)
  }

  private def checkPhashQuery(name: String, cap: Option[Int]): Unit = {
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val prs = rows(name)
    val got = prs.map(r => (r.getAs[Long]("doc_a"),
      r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    val want = refPairs(docs, cap)
    assert(got.toSet == want,
      s"$name != replay (${got.length} vs ${want.size} pairs)")
    assert(got.length == want.size, s"$name has duplicate rows")
    assert(got.sortBy(p => (p._1, p._2)).sameElements(got), s"$name order")
    assert(got.nonEmpty, s"$name found no pairs on this corpus")
    got.foreach { case (a, b, hm) =>
      assert(a < b && hm >= 0L && hm <= 7L, s"($a,$b,$hm) out of contract")
    }
  }

  test("mm03: exact match against an independent plane+DCT+band replay") {
    checkPhashQuery("mm03_phash_neardup", None)
  }

  test("mm03c: capped twin matches the replay and differs from mm03") {
    checkPhashQuery("mm03c_phash_bandcap", Some(2))
    // the cap must BITE on this corpus or the twin pins nothing
    assert(rows("mm03c_phash_bandcap").length <
      rows("mm03_phash_neardup").length, "bandCap did not bite")
  }

  test("mm05: clusters equal union-find over the replayed pairs, " +
    "labels are component minima, singletons keep their own id") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    refPairs(docs, None).foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val wantLabel = docs.keys.map(id => id -> find(id)).toMap
    val wantSize = wantLabel.values.groupBy(identity).map {
      case (l, g) => l -> g.size.toLong
    }
    val got = rows("mm05_phash_clusters").map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))
    assert(got.length == docs.size, "one row per document")
    got.foreach { case (id, cl, sz) =>
      assert(cl == wantLabel(id), s"doc $id label $cl != ${wantLabel(id)}")
      assert(sz == wantSize(cl), s"cluster $cl size $sz != ${wantSize(cl)}")
    }
    assert(got.exists(_._3 > 1L), "no multi-member cluster on this corpus")
  }

  test("phash64: identical planes → 0, mild noise → small, " +
    "unrelated planes → large hamming") {
    val rnd = new scala.util.Random(42)
    val base = Array.fill(1024)(rnd.nextInt(256).toLong)
    val noisy = base.clone()
    for (i <- Seq(17, 403, 700, 999))
      noisy(i) = (noisy(i) + 40L) % 256L
    val other = Array.fill(1024)(rnd.nextInt(256).toLong)
    def hm(a: Array[Long], b: Array[Long]) = java.lang.Long.bitCount(
      graft.operators.Multimodal.phash64(a) ^
        graft.operators.Multimodal.phash64(b))
    assert(hm(base, base.clone()) == 0)
    assert(hm(base, noisy) <= 7, s"mild noise moved ${hm(base, noisy)} bits")
    assert(hm(base, other) >= 15, s"unrelated planes only ${hm(base, other)}")
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
