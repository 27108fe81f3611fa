package graft

import org.apache.spark.sql.functions._

/** x70 completeness/soundness: the prefix+length-filtered join must equal
  * the brute-force all-pairs Jaccard ≥ 1/2 result exactly — the filters
  * are pruning rules, never semantics. Corpus built with near-dup pairs
  * (one word changed), a shared-boilerplate-but-dissimilar cluster, and
  * length mismatches the length filter must not mishandle.
  */
class PrefixJaccardSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("x70").toString
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      // 0/1: near-dups (one token differs -> J well above 1/2)
      (0L, base),
      (1L, base.replace("w40", "q40")),
      // 2: shares a long prefix of 0 but under half overall
      (2L, (1 to 12).map(i => s"w$i").mkString(" ") + " " +
        (1 to 30).map(i => s"z$i").mkString(" ")),
      // 3/4: identical short docs (J = 1)
      (3L, "p1 p2 p3 p4 p5 p6"),
      (4L, "p1 p2 p3 p4 p5 p6"),
      // 5: much longer superset of 3 — killed by the length filter
      // AND genuinely under threshold
      (5L, "p1 p2 p3 p4 p5 p6 " + (1 to 40).map(i => s"y$i").mkString(" ")),
      // 6: unrelated
      (6L, (1 to 25).map(i => s"k$i").mkString(" ")))
      .map { case (id, t) => (id, t, "en", "synthetic", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    d
  }

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap

  test("prefix-filtered join equals brute-force all-pairs at J >= 1/2") {
    GraftExtensions.install(spark)
    val t = Tables.documents(spark, dir)
      .withColumn("sh", expr("shingles3(text)"))
      .select(col("doc_id"), col("sh"))
    val brute = t.as("a").join(t.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("bigint")
          .as("inter"),
        size(col("a.sh")).cast("bigint").as("sa"),
        size(col("b.sh")).cast("bigint").as("sb"))
      .filter(col("inter") * 2 >= col("sa") + col("sb") - col("inter"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sa") + col("sb") - col("inter"))).as("jaccard"))
    val got = collectPairs(operators.DedupQueries.prefixJaccard(spark, dir))
    val want = collectPairs(brute)
    assert(got == want)
    // the corpus exercises both accept and reject paths
    assert(want.contains((0L, 1L)) && want.contains((3L, 4L)))
    assert(!want.contains((3L, 5L)) && !want.contains((0L, 2L)))
    assert(want((3L, 4L)) == 1.0)
    spark.catalog.clearCache()
  }
}
