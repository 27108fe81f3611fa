package graft

/** [[graft.functions.VecSumLong]]: native element-wise long-array sum —
  * the Lloyd-update kernel. Must match the per-dimension sum spelling
  * exactly, at any vector width.
  */
class VecSumLongSpec extends SparkSpec {
  import spark.implicits._

  test("matches per-dimension sums, any width, incl. negatives") {
    GraftExtensions.install(spark)
    val df = Seq(
      (0L, Seq(1L, 2L, 3L, 4L)),
      (0L, Seq(10L, -20L, 30L, -40L)),
      (1L, Seq(5L, 5L, 5L, 5L)),
      (2L, Seq(-1L, 0L, 1L, Long.MaxValue / 2)))
      .toDF("k", "v")
    val got = df.groupBy("k")
      .agg(org.apache.spark.sql.functions.expr("vec_sum_long(v)").as("s"))
      .orderBy("k")
      .as[(Long, Seq[Long])].collect().toSeq
    assert(got == Seq(
      (0L, Seq(11L, -18L, 33L, -36L)),
      (1L, Seq(5L, 5L, 5L, 5L)),
      (2L, Seq(-1L, 0L, 1L, Long.MaxValue / 2))))
  }

  test("agrees with the typed fold on real quantized vectors") {
    GraftExtensions.install(spark)
    val e = Tables.embeddings(spark, sf).limit(200)
      .selectExpr("vec_id % 7 AS k",
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000+0.5) AS BIGINT)) AS q")
    val fast = e.groupBy("k")
      .agg(org.apache.spark.sql.functions.expr("vec_sum_long(q)").as("s"))
      .as[(Long, Array[Long])].collect().map(t => t._1 -> t._2.toSeq).toMap
    val slow = e.as[(Long, Array[Long])].collect().toSeq
      .groupBy(_._1)
      .map { case (k, vs) =>
        k -> vs.map(_._2).reduce((a, b) =>
          a.zip(b).map { case (x, y) => x + y }).toSeq
      }
    assert(fast == slow)
  }

  test("NULL arrays are skipped; an all-NULL group yields NULL") {
    GraftExtensions.install(spark)
    val row = spark.sql(
      """SELECT
           (SELECT vec_sum_long(v) FROM VALUES (array(1L,2L)), (NULL),
             (array(3L,4L)) AS t(v)) AS s1,
           (SELECT vec_sum_long(v) FROM VALUES
             (CAST(NULL AS ARRAY<BIGINT>)) AS t(v)) AS s2""")
      .collect().head
    assert(row.getSeq[Long](0) == Seq(4L, 6L))
    assert(row.isNullAt(1))
  }

  test("length mismatch within a group fails loudly") {
    GraftExtensions.install(spark)
    val e = intercept[Exception] {
      spark.sql("""SELECT vec_sum_long(v) FROM VALUES
        (array(1L,2L)), (array(1L,2L,3L)) AS t(v)""").collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      (e.getCause != null && e.getCause.getMessage.contains("length mismatch")) ||
      e.toString.contains("length mismatch"))
  }
}
