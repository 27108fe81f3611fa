package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Semantic pins for the curriculum / robust-stats / sketch queries
  * (x50-x54) beyond the driver's DuckDB hash-compare: brute-force JVM
  * recomputation where affordable (x51, x53, x54), structural
  * invariants (x50), and the algebraic properties the scale arguments
  * rest on (x52's monoid merge, x54's min-k merge).
  */
class RobustStatsSpec extends SparkSpec {

  private def md5hexOf(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("x50: schedule is a permutation with dense per-shard positions") {
    val rows = SparkEntry.queries("x50_curriculum_order")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("stage"),
        r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    val nDocs = Tables.documents(spark, sf).count()
    // every document appears exactly once
    assert(rows.length.toLong == nDocs)
    assert(rows.map(_._1).distinct.length.toLong == nDocs)
    // stages and shards stay in their declared ranges
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 9))
    assert(rows.forall(r => r._3 >= 0 && r._3 <= 3))
    // positions are dense 1..n within every (stage, shard)
    rows.groupBy(r => (r._2, r._3)).foreach { case (key, grp) =>
      val ps = grp.map(_._4).sorted.toSeq
      assert(ps == (1L to grp.length.toLong), s"gap in $key")
    }
    // determinism: a second run produces the identical schedule
    val again = SparkEntry.queries("x50_curriculum_order")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("stage"),
        r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(rows.toSeq == again.toSeq)
  }

  test("x51: median/MAD/outliers match a brute-force JVM recompute") {
    val got = SparkEntry.queries("x51_mad_outliers")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("med_tokens"),
          r.getAs[Long]("mad_tokens"), r.getAs[Long]("n_outliers"))))
      .toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // lower median = element at rank (n+1)/2 under a total (v, id) order
    def lowerMedian(vs: Seq[(Long, Long)]): Long = {
      val sorted = vs.sortBy(identity).map(_._1)
      sorted((sorted.length + 1) / 2 - 1)
    }
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val med = lowerMedian(ds.map(d => (d._3, d._2)).toSeq)
      val devs = ds.map(d => (math.abs(d._3 - med), d._2)).toSeq
      val mad = lowerMedian(devs)
      val out = devs.count(_._1 > 3 * mad).toLong
      src -> ((ds.length.toLong, med, mad, out))
    }
    assert(got == expected)
  }

  test("x52: sketch merges as a monoid and the estimator is bounded") {
    GraftExtensions.install(spark)
    val docs = Tables.documents(spark, sf)
    val whole = operators.DedupQueries.sourceSketch(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("idx")) ->
        r.getAs[Long]("mh")).toMap
    // split the corpus into two arbitrary shards; the elementwise min of
    // the shard sketches must equal the whole-corpus sketch
    val shardA = operators.DedupQueries
      .sourceSketch(docs.filter(col("doc_id") % 2 === 0)).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("idx")) ->
        r.getAs[Long]("mh")).toMap
    val shardB = operators.DedupQueries
      .sourceSketch(docs.filter(col("doc_id") % 2 === 1)).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("idx")) ->
        r.getAs[Long]("mh")).toMap
    val merged = (shardA.keySet ++ shardB.keySet).map { k =>
      k -> math.min(shardA.getOrElse(k, Long.MaxValue),
        shardB.getOrElse(k, Long.MaxValue))
    }.toMap
    assert(merged == whole)
    // pair surface: every unordered source pair once, estimates in [0, 1]
    val pairs = SparkEntry.queries("x52_source_sketch")(spark, sf).collect()
    val nSrc = docs.select("source").distinct().count()
    assert(pairs.length.toLong == nSrc * (nSrc - 1) / 2)
    pairs.foreach { r =>
      val e = r.getAs[Double]("est_jaccard")
      assert(e >= 0.0 && e <= 1.0)
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
  }

  /** Guards the md5-derived shard assignment in x50 against engine
    * drift: the Spark-side conv(substr(md5)) % shards must equal a JVM
    * recomputation (the same argument PipelineOpsSpec makes for x37).
    */
  test("x50: shard assignment matches a JVM md5 recompute") {
    val rows = SparkEntry.queries("x50_curriculum_order")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard"))
    rows.foreach { case (id, shard) =>
      val expected =
        java.lang.Long.parseLong(md5hexOf(s"cur0|$id").take(15), 16) % 4
      assert(shard == expected, s"doc $id")
    }
  }

  /** Reimplements the whole CDC pipeline in plain Scala — boundary
    * hash, chunk split, fingerprint, aggregation — and demands the
    * identical repeated-chunk table.
    */
  test("x53: repeated chunks match a JVM recompute of the CDC split") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val chunks = texts.flatMap { case (id, text) =>
      val w = text.split(" ", -1)
      val n = w.length
      val bpos = (8 to n).filter { i =>
        val window = w.slice(i - 8, i).mkString(" ")
        java.lang.Long.parseLong(md5hexOf(window).take(15), 16) % 16 == 0
      }
      val bounds = (0 +: bpos) ++
        (if (bpos.isEmpty || bpos.last != n) Seq(n) else Seq())
      bounds.sliding(2).map { case Seq(a, b) =>
        (id, b - a, md5hexOf(w.slice(a, b).mkString(" ")))
      }
    }
    val expected = chunks.groupBy(_._3).collect {
      case (fp, cs) if cs.length > 1 =>
        fp -> ((cs.head._2.toLong, cs.length.toLong,
          cs.map(_._1).distinct.length.toLong, cs.map(_._1).min))
    }
    val got = SparkEntry.queries("x53_cdc_chunks")(spark, sf).collect()
      .map(r => r.getAs[String]("chunk_fp") ->
        ((r.getAs[Long]("n_chunk_tokens"), r.getAs[Long]("n_copies"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("canonical_doc"))))
      .toMap
    assert(got == expected)
  }

  /** The min-k sample is a monoid (min-k of a union = min-k of the
    * merged shard samples) and the full est/exact table matches a JVM
    * recompute.
    */
  test("x54: quantile table matches JVM recompute; min-k sample merges") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def hv(id: Long): Long =
      java.lang.Long.parseLong(md5hexOf(s"q0|$id").take(15), 16)
    def minK(ds: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] =
      ds.sortBy(d => (hv(d._2), d._2)).take(64)
    def rankQ(vals: Seq[(Long, Long)], q: Int): Long = {
      val sorted = vals.sortBy(identity).map(_._1)
      sorted(((q * sorted.length + 99) / 100) - 1)
    }
    val expected = docs.groupBy(_._1).flatMap { case (src, ds) =>
      val sample = minK(ds.toSeq)
      Seq(25, 50, 75, 90).map { q =>
        val est = rankQ(sample.map(d => (d._3, d._2)), q)
        val exact = rankQ(ds.map(d => (d._3, d._2)).toSeq, q)
        (src, q.toLong) -> ((est, exact, math.abs(est - exact)))
      }
    }
    val got = SparkEntry.queries("x54_quantile_sketch")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("q")) ->
        ((r.getAs[Long]("est"), r.getAs[Long]("exact"),
          r.getAs[Long]("abs_err"))))
      .toMap
    assert(got == expected)
    // monoid: per source, min-k of the union == min-k over merged
    // shard samples (split by doc parity)
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val (a, b) = ds.toSeq.partition(_._2 % 2 == 0)
      assert(minK(minK(a) ++ minK(b)) == minK(ds.toSeq), src)
    }
  }

  /** Pins the x55 determinism argument: floor(sqrt(exact int) · 1e6)
    * recomputed with JVM Math.sqrt must equal the engine's weight, and
    * the integer allocations must sum to ≤ budget with each share in
    * (0, 1).
    */
  test("x55: sqrt fixed-point weights match JVM; allocation is exact") {
    val rows = SparkEntry.queries("x55_mixture_weights")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val totFp = rows.map(_.getAs[Long]("weight_fp")).sum
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val expectedFp =
        math.floor(math.sqrt(n.toDouble) * 1000000L).toLong
      assert(r.getAs[Long]("weight_fp") == expectedFp, r.toString)
      val expectedAlloc =
        (BigInt(1000000L) * expectedFp / totFp).toLong
      assert(r.getAs[Long]("alloc_tokens") == expectedAlloc, r.toString)
      val share = r.getAs[Double]("share")
      assert(share > 0.0 && share < 1.0)
    }
    // floor allocation never overshoots the budget
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum <= 1000000L)
  }

  /** x56's per-source ledger must reconcile with an independent x05
    * replay: kept == canonical rows, totals add up corpus-wide.
    */
  test("x56: yield ledger reconciles with the x05 duplicate groups") {
    val rows = SparkEntry.queries("x56_dedup_yield")(spark, sf).collect()
    val x05 = SparkEntry.queries("x05_dedup_exact")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // kept docs across sources == number of distinct fingerprints (x05
    // emits one row per fingerprint, singletons included)
    assert(rows.map(_.getAs[Long]("n_kept")).sum == x05.length.toLong)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tokens_kept") <= r.getAs[Long]("tokens_total"))
    }
  }
}
