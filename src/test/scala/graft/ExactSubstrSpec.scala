package graft

/** x100 exact-substring dedup (Lee et al. 2021 ExactSubstr semantics)
  * on a hand-built corpus with known duplication structure: cross-doc
  * shared passages, WITHIN-doc repeats (the semantic x69 excludes),
  * whole-doc duplicates, the heavy-occurrence twin's floor — all
  * checked against an independent brute-force reference replay.
  */
class ExactSubstrSpec extends SparkSpec {

  private val L = 20

  // every building block is APERIODIC (no internal ≥L repeat — a
  // periodic block like "AB"*12 would self-overlap into extra window
  // occurrences and silently cross the heavy floor) and uses a
  // distinct alphabet so nothing collides by accident
  private val shared24 = "ABCDEFGHIJKLMNOPQRSTUVWX"    // docs 0+1, count 2
  private val rep20    = "qrstuvwxyz-QRSTUVWXY"        // doc 6, twice IN-DOC
  private val hot20    = "01234567-89+abcdefgh"        // docs 7-11, count 5
  private lazy val corpus: Seq[(Long, String)] = Seq(
    0L -> (shared24 + "(unique tail 0)"),
    1L -> ("[pre1]" + shared24 + "[post1]"),
    2L -> "totally unique passage with no repeats!!",
    3L -> "duplicate-pair-doc-BLOCK-30ch!",           // = doc 4, count 2
    4L -> "duplicate-pair-doc-BLOCK-30ch!",
    5L -> "tiny doc",                                 // shorter than L
    6L -> (rep20 + "-sep-" + rep20)
    // tail leads with the digit so every window past start 0 differs
    // per doc (a trailing digit would leave starts 1..4 identical
    // across the five docs and widen the hot coverage)
  ) ++ (7L to 11L).map(i => i -> (hot20 + s"$i-tail"))

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("x100").toString
    import spark.implicits._
    corpus.map { case (id, t) => (id, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    d
  }

  /** Independent reference: count every length-L window corpus-wide,
    * mark positions covered by a window occurring >= minCount times,
    * merge into maximal runs.
    */
  private def ref(minCount: Int): Map[Long, (Long, Long, Long)] = {
    val texts = corpus.toMap
    val counts = scala.collection.mutable.Map[String, Int]()
    for ((_, t) <- corpus; i <- 0 to t.length - L)
      counts(t.substring(i, i + L)) = counts.getOrElse(t.substring(i, i + L), 0) + 1
    corpus.map { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      for (i <- 0 to t.length - L; if counts(t.substring(i, i + L)) >= minCount;
           j <- i until i + L) covered(j) = true
      val dup = covered.count(identity)
      val spans = covered.indices.count(j => covered(j) && (j == 0 || !covered(j - 1)))
      id -> ((texts(id).length.toLong, dup.toLong, spans.toLong))
    }.toMap
  }

  private def got(minCount: Int): Map[Long, (Long, Long, Long)] =
    operators.DedupQueries.exactSubstrSpans(spark, dir, minCount).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  private lazy val base  = got(2)
  private lazy val heavy = got(5)

  test("engine output equals the brute-force reference at both floors") {
    assert(base == ref(2))
    assert(heavy == ref(5))
  }

  test("cross-doc shared passage coalesces into one maximal span " +
      "covering exactly the shared chars") {
    assert(base(0L)._2 == 24L && base(0L)._3 == 1L)
    assert(base(1L)._2 == 24L && base(1L)._3 == 1L)
  }

  test("WITHIN-doc repeat is duplicated under ExactSubstr — the " +
      "semantic x69's distinct-doc rule excludes") {
    // both copies of the 20-char block covered, separator clean
    assert(base(6L) == ((45L, 40L, 2L)))
  }

  test("whole-doc duplicates are fully covered; unique and too-short " +
      "docs report zero but still appear") {
    assert(base(3L)._2 == 30L && base(4L)._2 == 30L)
    assert(base(2L)._2 == 0L && base(5L) == ((8L, 0L, 0L)))
    assert(base.keySet == corpus.map(_._1).toSet)
  }

  test("the heavy floor keeps only the 5-occurrence block: pair-grade " +
      "duplication (shared passage, doc dup, in-doc repeat) drops") {
    (7L to 11L).foreach(i => assert(heavy(i)._2 == 20L, s"doc $i"))
    Seq(0L, 1L, 3L, 4L, 6L).foreach(i =>
      assert(heavy(i)._2 == 0L, s"doc $i must drop under the floor"))
    assert(heavy != base, "the twin must pin a different result")
  }
}
