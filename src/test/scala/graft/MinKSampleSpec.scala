package graft

import org.apache.spark.sql.functions._

/** Pins the native `mink_sample` aggregate (graft.functions.MinKSample):
  * equality with the window-rank spelling it replaces, partition/merge
  * invariance (the monoid argument that makes it safe map-side and in
  * streaming state), and the under-k edge.
  */
class MinKSampleSpec extends SparkSpec {

  private def docs = {
    GraftExtensions.install(spark)
    // the PRODUCTION staging — the point is pinning exactly what x54
    // and st11 run, not a lookalike respelling
    operators.PipelineQueries.minkStaged(Tables.documents(spark, sf))
  }

  private def collectAgg(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .groupBy(col("source"))
    .agg(expr(s"mink_sample(struct(hv, doc_id, n_tokens), $k)")
      .as("sample"))
    .select(col("source"), explode(col("sample")).as("e"))
    .select(col("source"), col("e.hv"), col("e.tag"), col("e.val"))
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    .toSet

  test("mink_sample equals the window-rank min-k spelling") {
    val viaAgg = collectAgg(docs, 64)
    val viaWindow = docs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("hv"), col("doc_id"))))
      .filter(col("rn") <= 64)
      .select(col("source"), col("hv"), col("doc_id"), col("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(viaAgg == viaWindow)
  }

  test("mink_sample is invariant under repartitioning (merge order)") {
    assert(collectAgg(docs, 16) == collectAgg(docs.repartition(7), 16))
    assert(collectAgg(docs, 16) == collectAgg(docs.repartition(1), 16))
  }

  test("mink_sample with k beyond the group size keeps every row sorted") {
    val viaAgg = collectAgg(docs, 100000)
    val all = docs.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(viaAgg == all)
    // and the emitted array itself is (hv, tag)-ascending
    val arrays = docs.groupBy(col("source"))
      .agg(expr("mink_sample(struct(hv, doc_id, n_tokens), 100000)")
        .as("sample"))
      .select(col("sample")).collect()
      .map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(e => (e.getLong(0), e.getLong(1))))
    arrays.foreach(a => assert(a == a.sorted))
  }
}
