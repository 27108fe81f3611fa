package graft

import org.apache.spark.sql.functions._

/** Pins the streaming KMV cardinality monitor (st13): the streaming
  * drain must equal the BATCH kmv_sketch aggregation on the same data
  * (the monoid-merge argument that makes the sketch arrival-order-
  * independent across micro-batches), and the estimate must stay
  * within the sketch's coarse error envelope of the exact count.
  */
class StreamingKmvSpec extends SparkSpec {

  private val hExpr =
    "CAST(conv(substr(md5(CAST(array_join(slice(split(text, ' ')," +
      " 1, 5), ' ') AS BINARY)), 1, 15), 16, 10) AS BIGINT)"

  test("st13: streaming drain equals the batch sketch, estimate sane") {
    GraftExtensions.install(spark)
    val batch = Tables.documents(spark, sf)
      .withColumn("h", expr(hExpr))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_in"),
        expr("kmv_sketch(h, 16)").as("uniq_est"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("docs_in"), r.getAs[Double]("uniq_est"))))
      .toMap
    val exact = Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(countDistinct(expr(hExpr)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("nd")).toMap
    val got = SparkEntry
      .queries("st13_stream_kmv_cardinality")(spark, sf).collect()
    assert(got.length == batch.size)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      val (docsIn, est) = batch(src)
      assert(r.getAs[Long]("docs_in") == docsIn)
      assert(r.getAs[Double]("uniq_est") == est)
      // K=16 KMV has ~1/sqrt(14) relative error; 3x is a generous
      // envelope that still catches a broken estimator
      val nd = exact(src).toDouble
      assert(est > nd / 3.0 && est < nd * 3.0,
        s"$src: est $est vs exact $nd")
    }
  }
}
