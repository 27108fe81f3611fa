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
}
