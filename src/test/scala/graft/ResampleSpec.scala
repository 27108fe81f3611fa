package graft

import org.apache.spark.sql.functions._

/** e14 resample+ffill vs a JVM brute force on sf0.001: contiguous grid,
  * event-count conservation, and exact forward-fill semantics.
  */
class ResampleSpec extends SparkSpec {

  test("e14 equals a per-user JVM ffill replay") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val got = graft.operators.EventQueries.defs("e14_resample_ffill")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate.toEpochDay) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    var rows = 0
    byUser.foreach { case (uid, es) =>
      val byDay = es.groupBy(e => Math.floorDiv(e._4, 86400000000L))
      val (dmin, dmax) = (byDay.keys.min, byDay.keys.max)
      var lastVal = Double.NaN
      (dmin to dmax).foreach { day =>
        val todays = byDay.getOrElse(day, Array.empty[(Long, Long, Double, Long)])
        if (todays.nonEmpty)
          lastVal = todays.maxBy(e => (e._4, e._2))._3
        val (n, v) = got((uid, day))
        assert(n == todays.length.toLong, s"n_events u$uid d$day")
        assert(v == lastVal, s"ffill u$uid d$day")
        rows += 1
      }
    }
    assert(rows == got.size, "grid is exactly the per-user day spans")
    spark.catalog.clearCache()
  }
}
