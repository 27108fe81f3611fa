package graft

/** [[graft.functions.DotLong]]: codegen'd integer dot product. */
class DotLongSpec extends SparkSpec {
  import spark.implicits._

  test("dot_long matches the HOF spelling, incl. edge shapes") {
    GraftExtensions.install(spark)
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq.empty[Long], Seq.empty[Long]),
      // length mismatch → NULL, matching zip_with's NULL padding (the
      // HOF spelling this expression claims bit-identity with)
      (Seq(2L), Seq(3L, 9L)),
      (Seq(-5L, 7L), Seq(3L, -2L)))
      .toDF("a", "b")
    val got = df.selectExpr("dot_long(a, b) AS d")
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(32L), Some(0L), None, Some(-29L)))
  }

  test("dot_long is null-safe on null arrays") {
    GraftExtensions.install(spark)
    val row = spark.sql(
      "SELECT dot_long(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS d")
      .collect().head
    assert(row.isNullAt(0))
  }

  test("dot_long returns NULL on NULL elements, like the HOF spelling") {
    GraftExtensions.install(spark)
    val rows = spark.sql(
      """SELECT
           dot_long(array(1L, NULL, 3L), array(4L, 5L, 6L)) AS d1,
           aggregate(zip_with(array(1L, NULL, 3L), array(4L, 5L, 6L),
             (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS d2,
           dot_long(array(1L, 2L), array(NULL, 5L)) AS d3,
           dot_long(array(1L, 2L), array(4L, 5L)) AS d4""")
      .collect().head
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
    assert(rows.getLong(3) == 14L)
  }

  test("dot_long agrees with aggregate/zip_with on random vectors") {
    GraftExtensions.install(spark)
    val vecs = Tables.embeddings(spark, sf).limit(50)
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000+0.5) AS BIGINT)) AS q")
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .selectExpr(
        "dot_long(a.q, b.q) AS fast",
        """aggregate(zip_with(a.q, b.q, (x, y) -> x * y),
           CAST(0 AS BIGINT), (acc, v) -> acc + v) AS slow""")
    assert(pairs.filter("fast <> slow").count() == 0)
  }
}
