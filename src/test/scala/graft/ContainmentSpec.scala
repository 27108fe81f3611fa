package graft

import org.apache.spark.sql.functions._

/** Semantic pin for x29: containment exists BECAUSE symmetric Jaccard
  * structurally misses a small document contained in a much larger one
  * (the union denominator drowns it). Constructed corpus: a 12-word
  * quote fully embedded in a 200-word page.
  */
class ContainmentSpec extends SparkSpec {

  test("containment catches a small-inside-big pair Jaccard misses") {
    import spark.implicits._
    val quote = (1 to 12).map(i => s"tok$i").mkString(" ")
    val page = ((100 to 280).map(i => s"w$i") :+ quote).mkString(" ")
    val corpus = Seq(
      (1L, "en", quote),          // the contained excerpt
      (2L, "en", page),           // the containing page
      (3L, "en", (300 to 340).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")

    val contained = operators.DedupQueries
      .containmentPairs(corpus, tau = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(contained == Set((1L, 2L)), contained.toString)

    // the same pair's Jaccard is far below any near-dup threshold:
    // |A∩B| = 10 quote shingles vs a union of ~190
    val sh = corpus
      .withColumn("w", split(col("text"), " "))
      .withColumn("sh", expr(
        """array_distinct(transform(sequence(1, size(w) - 2),
           i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ',
                       element_at(w, i + 2))))"""))
      .select(col("doc_id"), col("sh"))
    val jac = sh.as("a").join(sh.as("b"),
        col("a.doc_id") === 1L && col("b.doc_id") === 2L)
      .select((size(array_intersect(col("a.sh"), col("b.sh")))
        .cast("double") /
        size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .head().getDouble(0)
    assert(jac < 0.1, s"jaccard $jac should be tiny for small-inside-big")
  }

  test("dfCap drops boilerplate-driven pairs, keeps rare-shingle pairs") {
    import spark.implicits._
    // six docs that share ONLY a boilerplate footer (hot shingles,
    // df = 6) — pairwise containment 1.0 through boilerplate alone —
    // plus the genuine quote-in-page pair built from rare shingles
    // footer long enough that footer-only shingles dominate each doc's
    // shingle set (18 of 19 → pairwise containment 0.947 ≥ 0.8)
    val footer = (1 to 20).map(i => s"legal$i").mkString(" ")
    val quote = (1 to 12).map(i => s"tok$i").mkString(" ")
    val page = ((100 to 280).map(i => s"w$i") :+ quote).mkString(" ")
    val corpus = (Seq(
      (1L, "en", quote),
      (2L, "en", page)) ++
      (10L to 15L).map(i => (i, "en", s"unique$i " + footer)))
      .toDF("doc_id", "lang", "text")

    val exact = operators.DedupQueries
      .containmentPairs(corpus, tau = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.contains((1L, 2L)))
    assert(exact.exists(p => p._1 >= 10L), s"footer pairs expected: $exact")

    val capped = operators.DedupQueries
      .containmentPairs(corpus, tau = 0.8, dfCap = Some(3))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // footer shingles have df 6 > 3 → dropped → boilerplate pairs die;
    // the quote's shingles have df 2 → the real pair survives intact
    assert(capped.contains((1L, 2L)), capped.toString)
    assert(!capped.exists(p => p._1 >= 10L),
      s"capped run must drop boilerplate pairs: $capped")
  }
}
