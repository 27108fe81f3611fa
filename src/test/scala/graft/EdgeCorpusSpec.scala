package graft

import org.apache.spark.sql.functions._

/** Degenerate-corpus robustness: the text/dedup family must survive the
  * documents a 100 TB crawl actually contains — empty strings, one-token
  * docs, exact-duplicate floods, unicode, and a doc far longer than its
  * neighbors — without crashing or emitting nulls in key columns. The
  * driver's synthetic corpus never exercises these, so this spec builds
  * its own parquet dir.
  */
class EdgeCorpusSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("edgecorpus").toString
    val docs = Seq(
      (0L, "", "en", "src0"),                       // empty text
      (1L, "x", "en", "src0"),                      // single token
      (2L, "the the the the the the the the", "en", "src0"), // degenerate repeat
      (3L, "café naïve 世界 tokens here", "fr", "src1"), // unicode
      (4L, ("token " * 5000).trim, "en", "src1"),   // long doc
      (5L, "the quick brown fox jumps over the lazy dog", "en", "src2"),
      (6L, "the quick brown fox jumps over the lazy dog", "en", "src2"), // exact dup
      (7L, "the quick brown fox jumps over the lazy dog", "en", "src3"), // cross-source dup
      (8L, "el rápido zorro marrón", "es", "src3"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private val docQueries = Seq(
    "x01_text_tokens", "x02_text_quality", "x03_lang_id",
    "x04_fingerprint", "x05_dedup_exact", "x06_dedup_minhash_lsh",
    "x07_dedup_simhash", "x08_ngram_jaccard", "x13_simhash_neardup",
    "x14_dedup_clusters", "x18_repetition_3gram", "x29_containment",
    "x36_unigram_logprob", "x69_dup_spans", "x70_prefix_jaccard",
    "x72_doc_entropy", "x77_quality_auc", "x78_good_turing",
    "x79_tokenizer_fertility",
    // round-6 rows: the capped twins and the audit serve paths must
    // survive the same degenerate inputs as their exact/self-contained
    // twins (the serve rows also exercise AuditServe.prepare against a
    // constructed corpus dir rather than driver testdata)
    "x06c_lsh_bandcap", "x08c_jaccard_dfcap", "x42_cluster_canonical",
    "x42s_canonical_serve", "x43_split_leakage", "x43s_leakage_serve",
    "x45_quality_drift", "x45s_drift_serve", "x47_lsh_recall_audit",
    "x47s_recall_serve", "x91_bpe_train", "x92_bpe_fertility",
    "x92s_bpe_encode_serve", "mm04_audio_vad",
    // the KN scorer must drop gram-free docs (0/1 token), the winnower
    // must zero them, the CMS must sketch the dup-flood tokens
    "x93_kneser_ney", "x94_winnowing", "x95_cms_heavy_hitters",
    // round-8 rows: the rebuilt pHash family (exact-dup flood must
    // band-collide at hamming 0, unicode code-point slicing must not
    // split surrogates), the unigram trainer (single-char words,
    // unicode pieces, the 5000-token doc), and its serve twin against
    // the constructed-corpus artifact root
    "mm03_phash_neardup", "mm03c_phash_bandcap",
    "x97_unigram_train", "x98_unigram_fertility", "x98s_unigram_serve")

  test("document-family queries survive a degenerate corpus") {
    for (name <- docQueries) {
      val rows =
        try SparkEntry.queries(name)(spark, dir).collect()
        catch { case e: Throwable =>
          fail(s"$name crashed on the edge corpus: ${e.getMessage}")
        }
      spark.catalog.clearCache()
      assert(rows != null, name)
    }
  }

  test("edge-corpus invariants: dup detection, entropy, fingerprints") {
    // exact dedup must fold the three identical docs into one group:
    // canonical = min id (5), n_copies = 3
    val exact = SparkEntry.queries("x05_dedup_exact")(spark, dir)
    val g = exact.filter(col("canonical_id") === 5L)
      .select(col("n_copies")).collect().map(_.getLong(0))
    assert(g.toSeq == Seq(3L), s"expected one 3-copy group, got ${g.toSeq}")
    spark.catalog.clearCache()
    // the all-"the" doc has zero entropy; the mixed doc has more
    val ent = SparkEntry.queries("x72_doc_entropy")(spark, dir)
      .select(col("doc_id"), col("entropy_unat")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ent(2L) == 0L, s"repeat doc entropy ${ent(2L)}")
    assert(ent(5L) > 0L)
    spark.catalog.clearCache()
    // clusters: the three dups land in one cluster
    val cl = SparkEntry.queries("x14_dedup_clusters")(spark, dir)
      .filter(col("doc_id").isin(5L, 6L, 7L))
      .select(col("cluster_id")).distinct().count()
    assert(cl == 1L, "identical docs must share one near-dup cluster")
    spark.catalog.clearCache()
    // the pHash digest plane: identical content (5,6,7) must pair at
    // hamming 0 regardless of source; the empty doc must not crash or
    // pair with anything (its plane is a pure salt pattern)
    val ph = SparkEntry.queries("mm03_phash_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val zero = ph.filter(_._3 == 0L).map(p => (p._1, p._2)).toSet
    assert(Set((5L, 6L), (5L, 7L), (6L, 7L)).subsetOf(zero),
      s"exact dups missing from hamming-0 pairs: $zero")
    assert(!ph.exists(p => p._1 == 0L || p._2 == 0L),
      "the empty doc paired with something")
    spark.catalog.clearCache()
    // unigram coverage must hold on the degenerate corpus too: every
    // word type reconstructs from its segmentation (incl. unicode and
    // the 5000-token doc's word)
    val seg = operators.UnigramQueries.trainLoop(spark, dir)._2
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(seg.nonEmpty)
    seg.foreach { case (w, r) =>
      assert(r.split('\u0001').mkString == w, s"coverage broken for '$w'")
    }
    spark.catalog.clearCache()
  }
}
