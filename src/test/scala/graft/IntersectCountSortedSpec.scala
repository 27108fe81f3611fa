package graft

/** [[graft.functions.IntersectCountSorted]]: codegen'd two-pointer
  * distinct-intersection count over sorted long arrays — must be
  * bit-identical to `size(array_intersect(a, b))` on sorted inputs
  * (the x70 verify kernel it replaced).
  */
class IntersectCountSortedSpec extends SparkSpec {
  import spark.implicits._

  test("matches size(array_intersect) on sorted arrays, incl. duplicates") {
    GraftExtensions.install(spark)
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),           // plain overlap
      (Seq.empty[Long], Seq(1L, 2L)),                // empty side
      (Seq.empty[Long], Seq.empty[Long]),            // both empty
      (Seq(1L, 1L, 2L, 2L, 3L), Seq(1L, 2L, 2L, 5L)),// duplicates: count once
      (Seq(-9L, -3L, 0L, 7L), Seq(-3L, 7L, 7L, 8L)), // negatives + dup tail
      (Seq(5L), Seq(5L)),                            // singletons equal
      (Seq(5L), Seq(6L)),                            // singletons disjoint
      (Seq(1L, 4L, 9L), Seq(2L, 3L, 10L)))           // interleaved disjoint
      .toDF("a", "b")
    val bad = df.selectExpr(
      "intersect_count_sorted(a, b) AS fast",
      "CAST(size(array_intersect(a, b)) AS BIGINT) AS slow")
      .filter("fast <> slow OR fast IS NULL")
    assert(bad.count() == 0)
  }

  test("agrees with size(array_intersect) on the corpus' hashed shingles") {
    GraftExtensions.install(spark)
    // the exact x70 input shape: sorted 60-bit md5-derived hashes
    val t = Tables.documents(spark, sf).limit(40)
      .selectExpr("doc_id",
        """array_sort(transform(shingles3(text),
             x -> CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)))
           AS hs""")
    val pairs = t.as("a").crossJoin(t.as("b"))
      .selectExpr(
        "intersect_count_sorted(a.hs, b.hs) AS fast",
        "CAST(size(array_intersect(a.hs, b.hs)) AS BIGINT) AS slow")
    assert(pairs.filter("fast <> slow").count() == 0)
  }

  test("NULL array and NULL element yield NULL") {
    GraftExtensions.install(spark)
    val row = spark.sql(
      """SELECT
           intersect_count_sorted(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS d1,
           intersect_count_sorted(array(1L, NULL), array(1L, 2L)) AS d2,
           intersect_count_sorted(array(1L, 2L), array(1L, 2L)) AS d3""")
      .collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
    assert(row.getLong(2) == 2L)
  }
}
