package graft

/** [[graft.functions.SimHashBits]]: one-pass bit-majority must be
  * bit-identical to the 32-term HOF spelling (the oracle's semantics).
  */
class SimHashBitsSpec extends SparkSpec {

  test("simhash_bits matches the HOF spelling on the corpus") {
    GraftExtensions.install(spark)
    val th = Tables.documents(spark, sf)
      .selectExpr("doc_id", "split(text, ' ') AS w")
      .selectExpr("doc_id",
        "transform(w, t -> CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT)) AS th")
    val both = th.selectExpr("doc_id",
      "simhash_bits(th) AS fast",
      s"${operators.DedupQueries.sparkSimhashHof} AS slow")
    assert(both.filter("fast <> slow").count() == 0)
  }

  test("simhash_bits edge shapes: empty, null element, null array") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT
           simhash_bits(CAST(array() AS ARRAY<BIGINT>)) AS empty,
           simhash_bits(CAST(NULL AS ARRAY<BIGINT>)) AS whole_null,
           simhash_bits(array(CAST(NULL AS BIGINT), 7L, 7L)) AS with_null,
           simhash_bits(array(7L, 7L, 7L)) AS dense""").collect().head
    assert(r.getLong(0) == 0L)      // no tokens -> no majority bits
    assert(r.isNullAt(1))           // null array -> null
    // null excluded from numerator, included in denominator:
    // bits of 7 appear 2/3 times -> majority holds (2*2 > 3)
    assert(r.getLong(2) == 7L)
    assert(r.getLong(3) == 7L)
  }
}
