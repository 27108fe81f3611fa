package graft

/** Product-quantization family (x81-x84): structural invariants the
  * oracle hash can't articulate — codebook shape, code-count
  * partitioning, search-contract properties, and that the re-rank stage
  * never returns worse recall than raw ADC (it re-scores a superset of
  * ADC's top-k with the exact metric the ground truth uses).
  */
class PqSpec extends SparkSpec {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("x81: 8 subspaces, ≤16 live codes each, counts partition the corpus") {
    val st = rows("x81_pq_codebooks")
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val bySub = st.groupBy(_.getAs[Int]("sub"))
    assert(bySub.keySet == (0 until 8).toSet)
    bySub.foreach { case (sub, rs) =>
      assert(rs.length <= 16, s"sub $sub has ${rs.length} codes")
      assert(rs.map(_.getAs[Long]("n_vecs")).sum == n,
        s"sub $sub code counts don't partition the corpus")
      assert(rs.forall(_.getAs[Long]("sum_err") >= 0L))
    }
  }

  test("x82/x84: k results per probe, never the probe, ranks dense, " +
    "distances non-decreasing in rank") {
    for (name <- Seq("x82_pq_adc_search", "x84_pq_rerank")) {
      val rs = rows(name)
      val distCol = if (name.startsWith("x82")) "adc_dist" else "dist"
      val byQ = rs.groupBy(_.getAs[Long]("q_id"))
      assert(byQ.keySet == (0L until 8L).toSet, s"$name probe set")
      byQ.foreach { case (q, g) =>
        val sorted = g.sortBy(_.getAs[Long]("rank"))
        assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 5L),
          s"$name q=$q ranks")
        assert(sorted.forall(_.getAs[Long]("neighbor_id") != q))
        val ds = sorted.map(_.getAs[Long](distCol))
        assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
          s"$name q=$q $distCol not sorted")
        assert(ds.forall(_ >= 0L))
      }
    }
  }

  test("x83: re-rank recall is never below raw ADC recall") {
    val au = rows("x83_pq_recall_audit")
    assert(au.length == 8)
    au.foreach { r =>
      val ha = r.getAs[Long]("n_hits_adc")
      val hr = r.getAs[Long]("n_hits_rerank")
      assert(ha >= 0L && ha <= 5L && hr >= 0L && hr <= 5L)
      assert(hr >= ha,
        s"q=${r.getAs[Long]("q_id")}: rerank $hr < adc $ha")
      assert(r.getAs[Double]("recall_adc") == ha / 5.0)
      assert(r.getAs[Double]("recall_rerank") == hr / 5.0)
    }
  }

  test("x85: IVFADC contract — k per probe, no self, distances sorted, " +
    "and every neighbor's reported bucket is its IVF assignment") {
    val buckets = rows("x10_ann_ivf_assign")
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    val byQ = rows("x85_ivfpq_search").groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (0L until 8L).toSet)
    byQ.foreach { case (q, g) =>
      val sorted = g.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 5L),
        s"q=$q ranks")
      val ds = sorted.map(_.getAs[Long]("adc_dist"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
      sorted.foreach { r =>
        val nb = r.getAs[Long]("neighbor_id")
        assert(nb != q)
        assert(r.getAs[Long]("bucket") == buckets(nb),
          s"q=$q neighbor $nb bucket mismatch vs x10")
      }
    }
  }

  test("x82s: serve path over persisted books + codes equals the " +
    "self-contained x82") {
    def asSet(name: String) = rows(name).map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc_dist"))).toSet
    assert(asSet("x82s_pq_serve") == asSet("x82_pq_adc_search"))
    val root = operators.SimilarityQueries.serveRoot(sf)
    assert(new java.io.File(s"$root/pq/books").isDirectory)
    assert(new java.io.File(s"$root/pq/codes").isDirectory)
  }

  test("x85s: serve path over persisted centroids + residual codes " +
    "equals the self-contained x85") {
    def asSet(name: String) = rows(name).map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc_dist"),
        r.getAs[Long]("bucket"))).toSet
    assert(asSet("x85s_ivfpq_serve") == asSet("x85_ivfpq_search"))
    val root = operators.SimilarityQueries.serveRoot(sf)
    assert(new java.io.File(s"$root/pqres/books").isDirectory)
    assert(new java.io.File(s"$root/pqres/codes").isDirectory)
  }

  test("st16: streaming encode state equals the batch codebook stats") {
    def asSet(name: String) = rows(name).map(r =>
      (r.getAs[Int]("sub"), r.getAs[Long]("code"),
        r.getAs[Long]("n_vecs"), r.getAs[Long]("sum_err"))).toSet
    assert(asSet("st16_stream_pq_encode") == asSet("x81_pq_codebooks"))
  }

  test("x84 re-rank agrees with a direct exact scan restricted to its " +
    "shortlist semantics: top-1 of rerank is the true nearest whenever " +
    "the true nearest survived the ADC shortlist") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("qe", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"))
      .select(col("vec_id"), col("qe"))
    val vecs = e.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Long]]("qe").toArray).toMap
    def sq(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val rer = rows("x84_pq_rerank")
    val top1 = rer.filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Long]("dist"))).toMap
    top1.foreach { case (q, (nb, d)) =>
      assert(d == sq(vecs(q), vecs(nb)),
        s"q=$q: reported dist is not the exact L2 of ($q,$nb)")
      val trueNearest = vecs.keys.filter(_ != q)
        .minBy(v => (sq(vecs(q), vecs(v)), v))
      // if the true nearest is in the reported set at all, it must be rank 1
      val reported = rer.filter(_.getAs[Long]("q_id") == q)
        .map(_.getAs[Long]("neighbor_id")).toSet
      if (reported.contains(trueNearest))
        assert(nb == trueNearest, s"q=$q: true nearest demoted below rank 1")
    }
  }
}
