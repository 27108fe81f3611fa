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
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d/embeddings.parquet")
    d
  }

  test("similarity family survives zero / duplicate / constant vectors") {
    for (name <- Seq("x10_ann_ivf_assign", "x11_embed_neardup",
        "x11c_neardup_bucketcap", "x28_embed_quantize",
        "x41_embed_dedup_clusters", "x59_embed_dim_stats",
        "x63_knn_hubness")) {
      val rows =
        try SparkEntry.queries(name)(spark, dir).collect()
        catch { case e: Throwable =>
          fail(s"$name crashed on degenerate embeddings: ${e.getMessage}")
        }
      spark.catalog.clearCache()
      assert(rows != null, name)
    }
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
