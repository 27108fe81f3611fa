package graft

import org.apache.spark.sql.functions._

/** Native KMV distinct-count sketch: exact below K, estimator accuracy,
  * and merge/partition independence (the property that makes map-side
  * partial aggregation CORRECT, not just fast).
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val hashExpr =
    "CAST(conv(substr(md5(CAST(v AS STRING)), 1, 15), 16, 10) AS BIGINT)"

  private def est(n: Int, k: Int, partitions: Int): Double = {
    GraftExtensions.install(spark)
    (1 to n).toDF("v")
      .repartition(partitions)
      .withColumn("h", expr(hashExpr))
      .agg(expr(s"kmv_sketch(h, $k)"))
      .head().getDouble(0)
  }

  test("below K the count is exact (and duplicates don't inflate it)") {
    GraftExtensions.install(spark)
    val d = Seq(1, 2, 3, 2, 1, 3, 3).toDF("v")
      .withColumn("h", expr(hashExpr))
      .agg(expr("kmv_sketch(h, 16)")).head().getDouble(0)
    assert(d == 3.0)
  }

  test("estimate is within the ~1/sqrt(K) band of the true count") {
    val e = est(n = 20000, k = 256, partitions = 8)
    assert(math.abs(e - 20000) / 20000 < 0.2, s"est $e")
  }

  test("partitioning never changes the estimate (merge == single pass)") {
    val single = est(n = 5000, k = 128, partitions = 1)
    val many = est(n = 5000, k = 128, partitions = 32)
    assert(single == many) // bit-identical, not approximately equal
  }

  test("grouped sketches keep per-group state independent") {
    GraftExtensions.install(spark)
    val out = (1 to 3000).map(i => (i % 3, i)).toDF("g", "v")
      .withColumn("h", expr(hashExpr))
      .groupBy("g")
      .agg(countDistinct(col("v")).as("exact"),
        expr("kmv_sketch(h, 128)").as("est"))
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      val exact = r.getLong(1).toDouble
      assert(math.abs(r.getDouble(2) - exact) / exact < 0.3,
        s"group ${r.getInt(0)}: est ${r.getDouble(2)} vs exact $exact")
    }
  }
}
