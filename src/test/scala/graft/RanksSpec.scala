package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[graft.operators.Ranks]] — the distributed respell of the
  * partitionless `row_number`/`ntile` windows (e12, o15) — against the
  * literal window spellings it replaces, on keys with duplicates so the
  * tiebreak path is exercised, across asc/desc/mixed orders.
  */
class RanksSpec extends SparkSpec {

  test("globalRank equals the partitionless row_number for asc, desc, " +
      "and mixed keys (duplicate-heavy values, unique tiebreak)") {
    import spark.implicits._
    val df = (1 to 997).map(i => (i.toLong, (i * 37 % 101).toLong))
      .toDF("id", "v")
    val keySets = Seq(
      Seq(col("v"), col("id")),
      Seq(col("v").desc, col("id")),
      Seq(col("id").desc))
    keySets.foreach { ks =>
      val want = df
        .withColumn("r",
          row_number().over(Window.orderBy(ks: _*)).cast("long"))
        .select("id", "r").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = Caches.scope(spark)(
        operators.Ranks.globalRank(df, ks, "r")
          .select("id", "r").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet)
      assert(got == want, s"keys: $ks")
    }
  }

  test("globalRank on an empty frame returns an empty frame") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(Caches.scope(spark)(
      operators.Ranks.globalRank(df, Seq(col("v"), col("id")), "r")
        .count()) == 0L)
  }

  test("ntile4Sql matches Spark's ntile(4) for every n in 1..103") {
    import spark.implicits._
    // one frame of (n, r) pairs, ntile partitioned per n = 103 oracles
    // in one job; the closed form must agree on every (n, r)
    val rows = (1 to 103).flatMap(n => (1 to n).map(r => (n.toLong, r.toLong)))
    val df = rows.toDF("n", "r")
      .withColumn("want", ntile(4)
        .over(Window.partitionBy("n").orderBy("r")).cast("long"))
      .withColumn("got", expr(operators.Ranks.ntile4Sql("r", "n")))
    val bad = df.filter(col("want") =!= col("got")).collect()
    assert(bad.isEmpty, bad.take(5).mkString("; "))
  }
}
