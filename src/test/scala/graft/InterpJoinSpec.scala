package graft

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.functions._

/** j19 interpolation join vs a JVM brute force on sf0.001: bracket picks,
  * the exact integer interpolation formula, end clamps, and null cases.
  */
class InterpJoinSpec extends SparkSpec {

  private def sec(t: LocalDateTime): Long = t.toEpochSecond(ZoneOffset.UTC)

  test("j19 equals a per-event JVM brute force") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp_ntz").as("od"),
        expr("CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[LocalDateTime]("od"), r.getLong(3)))
    val byUser = orders.groupBy(_._1)
    val got = graft.operators.EventQueries.defs("j19_interp_join")
      .fn(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (uid, ts) = (r.getLong(1), r.getAs[LocalDateTime](2))
      val mine = byUser.getOrElse(uid, Array.empty)
      val prev = mine.filter(o => !o._3.isAfter(ts))
        .sortBy(o => (sec(o._3), o._2)).lastOption
      val next = mine.filter(o => o._3.isAfter(ts))
        .sortBy(o => (sec(o._3), o._2)).headOption
      val wantPrev = prev.map(_._2)
      val wantNext = next.map(_._2)
      val gotPrev = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val gotNext = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(gotPrev == wantPrev && gotNext == wantNext, s"brackets @$r")
      val want: Option[Long] = (prev, next) match {
        case (Some(p), Some(n)) =>
          val (t0, t1, t) = (sec(p._3), sec(n._3), sec(ts))
          val (v0, v1) = (p._4, n._4)
          // positive-operand truncating division, matching div/`//`
          Some(if (v1 >= v0) v0 + (v1 - v0) * (t - t0) / (t1 - t0)
               else v0 - (v0 - v1) * (t - t0) / (t1 - t0))
        case (Some(p), None) => Some(p._4)
        case (None, Some(n)) => Some(n._4)
        case _ => None
      }
      val gotI = if (r.isNullAt(5)) None else Some(r.getLong(5))
      assert(gotI == want, s"interp @$r")
      // interpolation stays inside the bracket-value envelope
      (prev, next, gotI) match {
        case (Some(p), Some(n), Some(v)) =>
          assert(v >= math.min(p._4, n._4) && v <= math.max(p._4, n._4))
        case _ => ()
      }
    }
    spark.catalog.clearCache()
  }
}
