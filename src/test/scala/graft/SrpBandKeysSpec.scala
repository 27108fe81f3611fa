package graft

import org.apache.spark.sql.functions._

/** Bit-equality of the native [[graft.functions.SrpBandKeys]] expression
  * against the composable HOF spelling (which is the Spark twin of the
  * DuckDB oracle's CTEs): proving the native form against the HOF form
  * on every driver vector proves it against the oracle.
  */
class SrpBandKeysSpec extends SparkSpec {

  test("native srp_band_keys equals the HOF spelling on every vector") {
    GraftExtensions.install(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("qe", expr(operators.SimilarityQueries.sparkQuant))
    val cmp = e
      .withColumn("native", expr("srp_band_keys(qe, 8, 8, 64)"))
      .withColumn("hof", expr(operators.SrpQueries.hofBandKeysExpr))
      .filter(not(col("native") <=> col("hof")))
    assert(cmp.count() == 0L, "native and HOF band keys diverge")
    spark.catalog.clearCache()
  }

  test("null and degenerate vectors") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val rows = Seq(
      (0L, Some(Seq.fill(64)(0L))),  // zero vector → all-ones keys
      (1L, None)                     // null array → null keys
    ).toDF("vec_id", "qe")
      .withColumn("native", expr("srp_band_keys(qe, 8, 8, 64)"))
      .collect().sortBy(_.getLong(0))
    val zeroKeys =
      rows(0).getAs[scala.collection.Seq[Long]]("native").toSeq
    assert(zeroKeys == Seq.fill(8)(255L), s"zero vector keys $zeroKeys")
    assert(rows(1).isNullAt(rows(1).fieldIndex("native")))
  }

  test("a vector of the wrong dimensionality fails loudly") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val short = Seq((0L, Seq.fill(63)(1L))).toDF("vec_id", "qe")
      .withColumn("native", expr("srp_band_keys(qe, 8, 8, 64)"))
    val ex = intercept[Exception](short.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    val all = messages(ex).mkString(" | ")
    assert(all.contains("63") && all.contains("64"),
      s"expected a dims-mismatch error naming 63 vs 64, got: $all")
  }
}
