package graft

/** x69 span-level dedup audit on a hand-built corpus with known overlap
  * structure: shared phrases become maximal spans, whole-doc duplicates
  * cover themselves entirely, unique and too-short docs report zero.
  */
class DupSpansSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("x69").toString
    import spark.implicits._
    val mk = (id: Long, text: String) =>
      (id, text, "en", "synthetic", text.length.toLong)
    Seq(
      // docs 0/1 share the 6-token phrase a1..a6 at different offsets
      mk(0L, "a1 a2 a3 a4 a5 a6 u1 u2 u3 u4 u5 u6 u7"),
      mk(1L, "v1 v2 v3 v4 v5 a1 a2 a3 a4 a5 a6 v6 v7"),
      // unique doc: nothing shared
      mk(2L, "z1 z2 z3 z4 z5 z6 z7"),
      // exact whole-doc duplicates: spans cover everything
      mk(3L, "b1 b2 b3 b4 b5 b6 b7"),
      mk(4L, "b1 b2 b3 b4 b5 b6 b7"),
      // shorter than one 5-gram window: no grams, no crash
      mk(5L, "s1 s2 s3"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    d
  }

  private lazy val rows: Map[Long, (Long, Long, Long)] =
    operators.DedupQueries.dupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("shared phrase coalesces into one maximal span per doc") {
    // two overlapping covered 5-gram windows merge into a 6-token span
    assert(rows(0L) == ((13L, 6L, 1L)))
    assert(rows(1L) == ((13L, 6L, 1L)))
  }

  test("unique and too-short docs report zero coverage") {
    assert(rows(2L) == ((7L, 0L, 0L)))
    assert(rows(5L) == ((3L, 0L, 0L)))
  }

  test("whole-doc duplicates are fully covered by a single span") {
    assert(rows(3L) == ((7L, 7L, 1L)))
    assert(rows(4L) == ((7L, 7L, 1L)))
  }

  test("every doc appears exactly once with non-negative coverage") {
    assert(rows.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    rows.foreach { case (_, (n, dup, spans)) =>
      assert(dup >= 0 && dup <= n && spans >= 0 && spans <= dup)
    }
  }
}
