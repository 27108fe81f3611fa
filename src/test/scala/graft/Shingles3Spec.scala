package graft

import org.apache.spark.sql.functions._

/** The native one-pass `shingles3` (graft.functions.Shingles3) must be
  * bit-identical to the composable HOF spelling it replaces — the
  * spelling the DuckDB oracles mirror — on the real corpus and on the
  * tokenizer edge cases (repeated/leading/trailing spaces produce empty
  * tokens that participate in grams; short docs fall back to the whole
  * text as one shingle).
  */
class Shingles3Spec extends SparkSpec {

  private def hof = expr(operators.DedupQueries.sparkShingles)

  test("matches the HOF spelling on the sf0.001 corpus") {
    GraftExtensions.install(spark)
    val mismatches = Tables.documents(spark, sf)
      .withColumn("w", expr("split(text, ' ')"))
      .withColumn("ref", hof)
      .withColumn("fast", expr("shingles3(text)"))
      .filter(col("ref") =!= col("fast"))
      .count()
    assert(mismatches == 0L)
  }

  test("edge cases: empties, short docs, repeated/trailing spaces") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val cases = Seq(
      "",                      // one empty token → short-doc fallback
      "a",                     // 1 word
      "a b",                   // 2 words
      "a b c",                 // exactly one gram
      "a b c d",               // two grams
      "a a a a",               // duplicate grams collapse
      "a  b c",                // double space → empty middle token
      " a b c",                // leading space → empty first token
      "a b c ",                // trailing space → empty last token
      "x y z x y z x y z")     // heavy duplication
    val out = cases.toDF("text")
      .withColumn("w", expr("split(text, ' ')"))
      .select(col("text"), hof.as("ref"),
        expr("shingles3(text)").as("fast"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"text=[${r.getString(0)}] ref=${r.getSeq[String](1)} " +
          s"fast=${r.getSeq[String](2)}")
    }
  }
}
