package graft

import org.apache.spark.sql.functions._

/** j17 semantic pin: the boundary-sweep spelling must equal the naive
  * day-grid spelling (explode every interval into its covered days, count
  * rows per day) — the quadratic formulation the sweep exists to avoid.
  * Run at sf0.001 where the naive plan is affordable.
  */
class OverlapSweepSpec extends SparkSpec {

  test("j17 sweep equals the naive per-day concurrency count") {
    val sweep = SparkEntry.queries("j17_overlap_sweep")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2))).toMap

    // naive: every interval contributes one row per covered day
    val iv = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate").cast("date").as("ship"))
      .join(Tables.orders(spark, sf).select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("odate")),
        col("l_orderkey") === col("o_orderkey"))
    val perDay = iv
      .select(col("l_suppkey"),
        explode(expr("sequence(least(odate, ship), greatest(odate, ship))"))
          .as("day"))
      .groupBy("l_suppkey", "day").agg(count(lit(1)).as("n"))
    val naive = perDay.groupBy("l_suppkey")
      .agg(max(col("n")).as("peak"),
        sum(when(col("n") >= 2, 1L)).as("days_ge2"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2))).toMap

    assert(sweep.keySet == naive.keySet)
    sweep.foreach { case (k, (peak, dge2)) =>
      assert(peak == naive(k)._1, s"peak mismatch for supplier $k")
      assert(dge2 == naive(k)._2, s"days_ge2 mismatch for supplier $k")
    }
  }

  test("j17 executes its join once: each input scanned a single time") {
    // the +1/-1 boundaries fan out via explode from one pass — a
    // unionAll spelling would scan (and join) lineitem+orders twice
    val scans = SparkEntry.queries("j17_overlap_sweep")(spark, sf)
      .queryExecution.sparkPlan.collectLeaves()
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.mkString
      }
    assert(scans.size == 2, s"expected 2 scans, got: $scans")
    assert(scans.distinct.size == 2)
  }
}
