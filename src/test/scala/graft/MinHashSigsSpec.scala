package graft

import org.apache.spark.sql.functions._

/** [[graft.functions.MinHashSigs]]: the native one-pass signatures must be
  * bit-identical to the K-pass HOF spelling (which the DuckDB oracle
  * mirrors), on real document shingles.
  */
class MinHashSigsSpec extends SparkSpec {

  test("minhash_sigs matches the HOF spelling on real shingles") {
    GraftExtensions.install(spark)
    val k = 6
    val hof = (0 until k).map(i =>
      expr(operators.DedupQueries.sparkMinhash(i)).as(s"h$i"))
    val df = Tables.documents(spark, sf)
      .withColumn("w", expr("split(text, ' ')"))
      .withColumn("sh", expr(
        """CASE WHEN size(w) < 3 THEN array(text)
           ELSE array_distinct(transform(sequence(1, size(w) - 2),
             i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ',
                         element_at(w, i + 2)))) END"""))
      .withColumn("sigs", expr(s"minhash_sigs(sh, $k)"))
      .select(col("doc_id") +: hof :+ col("sigs"): _*)
    val mismatches = df.filter(
      (0 until k).map(i => col("sigs").getItem(i) =!= col(s"h$i"))
        .reduce(_ || _))
    assert(mismatches.count() == 0)
  }

  test("minhash_sigs handles unicode shingles identically") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val df = Seq(Seq("héllo wörld ñ", "日本語 テスト 文"), Seq("a b c"))
      .toDF("sh")
      .selectExpr("sh", "minhash_sigs(sh, 3) AS sigs",
        "transform(sequence(0, 2), i -> array_min(transform(sh, " +
          "s -> CAST(conv(substr(md5(concat(CAST(i AS STRING), '|', s)), 1, 15), 16, 10) AS BIGINT)))) AS hof")
    assert(df.filter("sigs <> hof").count() == 0)
  }
}
