package graft

import graft.operators.BpeQueries

/** Hand-computed pins for the BPE merge trainer that the DuckDB oracle
  * cannot express on driver data alone: frequency-weighted selection,
  * left-to-right non-overlapping merge application, binary-order tie
  * breaking, merged-symbol reuse in later rounds, and early stop when the
  * pair supply runs dry.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(texts: String*): String = {
    val d = java.nio.file.Files.createTempDirectory("bpe").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def merges(dir: String): Seq[(Long, String, String, String, Long)] =
    BpeQueries.trainMerges(spark, dir).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[String]("sym_a"),
        r.getAs[String]("sym_b"), r.getAs[String]("merged"),
        r.getAs[Long]("n"))).toSeq

  test("frequency-weighted selection and early stop when pairs run dry") {
    // word types: aa ×3, ab ×1, b ×1 → round 1 picks (a,a) with n=3;
    // after the merge only ab still has a pair → round 2 picks (a,b)
    // n=1; then every word is a single symbol → the trainer must stop
    // at 2 rows, not emit Rounds rows
    val m = merges(corpusDir("aa aa ab", "aa b"))
    spark.catalog.clearCache()
    assert(m == Seq(
      (1L, "a", "a", "aa", 3L),
      (2L, "a", "b", "ab", 1L)), m.toString)
  }

  test("left-to-right non-overlapping application + merged-symbol reuse") {
    // 'xxx' ×2: round 1 counts (x,x) twice per occurrence → n=4, and the
    // merge must produce [xx, x] (never [x, xx]) so round 2 sees the
    // MERGED symbol as a pair member: (xx, x) with n=2
    val m = merges(corpusDir("xxx xxx"))
    spark.catalog.clearCache()
    assert(m == Seq(
      (1L, "x", "x", "xx", 4L),
      (2L, "xx", "x", "xxx", 2L)), m.toString)
  }

  test("count ties break to the binary-smaller pair on both engines") {
    // (b,a) and (d,c) both count 1 → 'b␁a' < 'd␁c' in binary order
    val m = merges(corpusDir("ba dc"))
    spark.catalog.clearCache()
    assert(m.head == (1L, "b", "a", "ba", 1L), m.toString)
    assert(m(1) == (2L, "d", "c", "dc", 1L), m.toString)
  }

  test("an empty corpus trains zero merges without crashing") {
    val m = merges(corpusDir(""))
    spark.catalog.clearCache()
    assert(m.isEmpty, m.toString)
  }
}
