package graft

import org.apache.spark.sql.functions._

/** Generic join combinators beyond asOf: salted skew-safe equi-join and
  * the binned large-large range join. Both must return EXACTLY what the
  * plain spelling returns — the combinators change the shuffle shape,
  * never the result.
  */
class JoinCombinatorsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin == plain inner join on a skewed key") {
    // 90% of left rows share key 1 — the classic hot-key profile
    val left = (1 to 1000)
      .map(i => (if (i % 10 == 0) i else 1, i)).toDF("k", "payload")
    val right = Seq((1, "hot"), (20, "cold"), (999, "missing-left"))
      .toDF("rk", "tag")
    val salted = operators.Joins.saltedJoin(left, right, "k", "rk", 8)
      .select("k", "payload", "tag")
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "payload", "tag")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin spreads a hot key across salt partitions") {
    val left = (1 to 256).map(i => (1, i)).toDF("k", "payload")
    val right = Seq((1, "hot")).toDF("rk", "tag")
    // count distinct salt values actually assigned on the left
    val sl = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)))
    assert(sl.select("__salt").distinct().count() > 1)
    assert(operators.Joins.saltedJoin(left, right, "k", "rk", 8)
      .count() == 256)
  }

  test("rangeJoinBinned == plain interval join, no duplicates") {
    val points = Seq(
      (1L, 100L, 50L), (2L, 100L, 150L), (3L, 100L, 250L),
      (4L, 200L, 150L), (5L, 100L, 300L)) // key 100/200, times in "us"
      .toDF("pid", "k", "t_us")
    val intervals = Seq(
      (10L, 100L, 40L, 160L),  // catches t=50, 150
      (11L, 100L, 150L, 300L), // catches t=150 (boundary), 250, 300
      (12L, 200L, 100L, 200L)) // other key: catches t=150 of pid 4
      .toDF("iid", "ik", "lo_us", "hi_us")
    val binned = operators.Joins.rangeJoinBinned(points, intervals,
        Seq("k"), Seq("ik"), "t_us", "lo_us", "hi_us", binWidthUs = 100L)
      .select("pid", "iid")
    val plain = points.join(intervals,
        col("k") === col("ik") &&
          col("lo_us") <= col("t_us") && col("t_us") <= col("hi_us"))
      .select("pid", "iid")
    val b = binned.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val p = plain.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(b.toSeq == p.toSeq) // exactly equal incl. multiplicity
    assert(b.length == b.distinct.length, "bin fan-out produced duplicates")
  }

  test("rangeJoinBinned handles intervals spanning many bins") {
    val points = Seq((1L, 7L, 999L)).toDF("pid", "k", "t_us")
    val intervals = Seq((10L, 7L, 0L, 1000L)) // spans 11 bins of width 100
      .toDF("iid", "ik", "lo_us", "hi_us")
    val out = operators.Joins.rangeJoinBinned(points, intervals,
      Seq("k"), Seq("ik"), "t_us", "lo_us", "hi_us", binWidthUs = 100L)
    assert(out.count() == 1)
  }

  test("bloomPrefilter: no false negatives, and it actually prunes") {
    val left = Tables.lineitem(spark, sf).select("l_orderkey")
    val right = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 400000d).select("o_orderkey")
    val pre = operators.Joins.bloomPrefilter(left, "l_orderkey",
      right, "o_orderkey", expectedItems = 10000L, numBits = 80000L)
    val preKeys = pre.select("l_orderkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val exactKeys = left.join(right,
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .distinct().collect().map(_.getLong(0)).toSet
    val leftKeys = left.distinct().collect().map(_.getLong(0)).toSet
    // superset of the true matches (no false negatives), subset of the
    // input, and a real reduction (false positives stay rare)
    assert(exactKeys.subsetOf(preKeys))
    assert(preKeys.subsetOf(leftKeys))
    assert(preKeys.size < leftKeys.size / 2,
      s"bloom pruned ${leftKeys.size - preKeys.size} of ${leftKeys.size}")
  }
}
