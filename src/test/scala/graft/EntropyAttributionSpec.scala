package graft

import org.apache.spark.sql.functions._

/** x72 doc entropy and x73 source attribution on hand-computable
  * fixtures plus invariants over the real sf0.001 corpus.
  */
class EntropyAttributionSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("x7273").toString
    import spark.implicits._
    Seq(
      // uniform 2-symbol doc: entropy exactly ln 2
      (0L, "a a b b", "alpha", 7L),
      // degenerate single-symbol doc: entropy exactly 0
      (1L, "c c c c c", "alpha", 9L),
      // source-distinct vocabularies: attribution must go diagonal
      (2L, "x1 x2 x3 x1 x2", "beta", 14L),
      (3L, "x1 x3 x2 x2 x1", "beta", 14L),
      (4L, "y1 y2 y3 y1 y2", "gamma", 14L),
      (5L, "y2 y1 y3 y3 y1", "gamma", 14L))
      .toDF("doc_id", "text", "source", "n_chars")
      .withColumn("lang", lit("en"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    d
  }

  test("x72: uniform doc = ln 2 micro-nats, degenerate doc = 0") {
    val rows = graft.operators.PipelineQueries.defs("x72_doc_entropy")
      .fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // L(4)-L(2) with L(x) = floor(ln(x)*1e6+0.5): 1386294 - 693147
    assert(rows(0L) == ((4L, 2L, 693147L)))
    assert(rows(1L) == ((5L, 1L, 0L)))
    spark.catalog.clearCache()
  }

  test("x72 invariants at sf0.001: 0 <= H <= ln(distinct)") {
    graft.operators.PipelineQueries.defs("x72_doc_entropy")
      .fn(spark, sf).collect().foreach { r =>
      val (dis, unat) = (r.getLong(2), r.getLong(3))
      assert(unat >= 0L)
      // micro-nat bound with 1-ulp slack per fixed-pointed log
      val cap = math.floor(math.log(dis.toDouble) * 1e6 + 0.5).toLong
      assert(unat <= cap + dis,
        s"entropy $unat above uniform cap $cap (distinct=$dis)")
    }
    spark.catalog.clearCache()
  }

  test("x73: disjoint-vocabulary sources attribute to themselves") {
    val m = graft.operators.PipelineQueries.defs("x73_source_attribution")
      .fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("beta", "beta")) == 2L)
    assert(m(("gamma", "gamma")) == 2L)
    assert(m(("alpha", "alpha")) == 2L)
    assert(m.values.sum == 6L) // every doc classified exactly once
    spark.catalog.clearCache()
  }

  test("x73 at sf0.001: every doc classified exactly once") {
    val total = graft.operators.PipelineQueries
      .defs("x73_source_attribution").fn(spark, sf)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    val docs = Tables.documents(spark, sf).count()
    assert(total == docs)
    spark.catalog.clearCache()
  }

  test("x76: terciles balanced per source and conserve the corpus") {
    val rows = graft.operators.PipelineQueries.defs("x76_ccnet_terciles")
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val bySource = rows.keys.groupBy(_._1)
    bySource.foreach { case (src, ks) =>
      assert(ks.map(_._2).toSet.subsetOf(Set(1L, 2L, 3L)), src)
      val counts = ks.toSeq.map(k => rows(k)._1)
      assert(counts.max - counts.min <= 1L,
        s"$src terciles unbalanced: $counts")
    }
    val total = rows.values.map(_._1).sum
    assert(total == Tables.documents(spark, sf).count())
    spark.catalog.clearCache()
  }
}
