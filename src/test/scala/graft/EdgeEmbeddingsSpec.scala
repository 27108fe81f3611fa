package graft

import org.apache.spark.sql.functions._

/** Degenerate-embedding robustness: zero vectors (dead rows from a
  * failed encoder), duplicate vectors, and a constant-dimension corpus
  * through the similarity family. Documents what the quantized-cosine
  * path does at qn = 0 — the division every cosine spelling performs.
  */
class EdgeEmbeddingsSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("edgeemb").toString
    val dim = 64
    def vec(f: Int => Float): Array[Float] = Array.tabulate(dim)(f)
    val rows = Seq(
      (0L, vec(_ => 0f), 0),                  // zero vector
      (1L, vec(i => i.toFloat / dim), 1),
      (2L, vec(i => i.toFloat / dim), 1),     // exact duplicate of 1
      (3L, vec(_ => 1f), 2),                  // constant vector
      (4L, vec(i => if (i == 0) 1f else 0f), 2),
      (5L, vec(i => (dim - i).toFloat / dim), 0))
    // testdata layout is one parquet FILE per table (not a directory):
    // the file-stream sources glob on the leaf name, so st16 only sees
    // the table if the constructed dir matches that shape
    val stage = s"$d/_stage"
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$d/embeddings.parquet"))
    d
  }

  test("similarity family survives zero / duplicate / constant vectors") {
    for (name <- Seq("x10_ann_ivf_assign", "x11_embed_neardup",
        "x11c_neardup_bucketcap", "x28_embed_quantize",
        "x41_embed_dedup_clusters", "x59_embed_dim_stats",
        "x63_knn_hubness", "x86_cluster_silhouette",
        "x87_csls_rescore", "x88_ivf_append",
        "x89_srp_lsh_ann", "x89c_srp_bandcap", "x90_srp_recall",
        "x96_hard_negatives", "x99_ivf_coarse_route",
        "dq10_embed_norms")) {
      val rows =
        try SparkEntry.queries(name)(spark, dir).collect()
        catch { case e: Throwable =>
          fail(s"$name crashed on degenerate embeddings: ${e.getMessage}")
        }
      spark.catalog.clearCache()
      assert(rows != null, name)
    }
  }

  test("dq10 flags the zero vector as dead in its label slice") {
    val rows = SparkEntry.queries("dq10_embed_norms")(spark, dir)
      .collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_dead")))
      .toMap
    spark.catalog.clearCache()
    assert(rows(0)._2 == 1L, s"label 0 must report its dead vector: $rows")
    assert(rows(1)._2 == 0L && rows(2)._2 == 0L, s"no false deads: $rows")
  }

  test("PQ family survives a 6-vector corpus (n < Codes seeds, zero / " +
    "duplicate / constant vectors; no division anywhere to diverge)") {
    for (name <- Seq("x81_pq_codebooks", "x82_pq_adc_search",
        "x83_pq_recall_audit", "x84_pq_rerank", "x85_ivfpq_search",
        "st16_stream_pq_encode", "st17_stream_ivf_assign",
        "st18_stream_srp_buckets")) {
      val rows =
        try SparkEntry.queries(name)(spark, dir).collect()
        catch { case e: Throwable =>
          fail(s"$name crashed on degenerate embeddings: ${e.getMessage}")
        }
      spark.catalog.clearCache()
      assert(rows.nonEmpty, s"$name returned no rows")
    }
  }

  test("exact-duplicate vectors PQ-encode identically: each is the " +
    "other's rank-1 re-rank neighbor at distance 0") {
    val rer = SparkEntry.queries("x84_pq_rerank")(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("dist")))
    spark.catalog.clearCache()
    assert(rer.contains((1L, 1L, 2L, 0L)), s"q=1 should re-rank 2 first")
    assert(rer.contains((2L, 1L, 1L, 0L)), s"q=2 should re-rank 1 first")
  }

  test("duplicate vectors pair at cos ~1; the zero vector pairs with nothing") {
    val pairs = SparkEntry.queries("x11_embed_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    spark.catalog.clearCache()
    val dup = pairs.find(p => p._1 == 1L && p._2 == 2L)
    // sqrt(n)·sqrt(n) rounds a hair under n, so identical vectors score
    // 1 − O(ulp), not exactly 1
    assert(dup.exists(_._3 > 0.999999d), s"expected (1,2,~1) in ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 0L || p._2 == 0L),
      s"zero vector must not near-dup-pair: ${pairs.toSeq}")
  }
}
