package graft

/** Facade smoke: typed entry points resolve and return rows. */
class GraftSpec extends SparkSpec {
  test("facade entry points return rows") {
    assert(Graft.dedup.exact(spark, sf).count() > 0)
    assert(Graft.text.tokens(spark, sf).count() > 0)
    assert(Graft.similarity.ivfSearch(spark, sf).count() > 0)
    assert(Graft.multimodal.frameSamples(spark, sf).count() > 0)
    assert(Graft.calendar(spark, sf).count() > 0)
    assert(Graft.run("j01_inner_join", spark, sf).count() > 0)
  }

  test("registerTables enables ad-hoc SQL incl. the dot_long extension") {
    Graft.registerTables(spark, sf)
    val joined = spark.sql(
      """SELECT o_orderkey, sum(l_quantity) AS qty
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1""")
    assert(joined.count() > 0)
    val dot = spark.sql(
      """SELECT dot_long(
           transform(embedding, x -> CAST(x * 1000 AS BIGINT)),
           transform(embedding, x -> CAST(x * 1000 AS BIGINT))) AS n
         FROM embeddings LIMIT 1""")
    assert(!dot.collect().head.isNullAt(0))
  }
}
