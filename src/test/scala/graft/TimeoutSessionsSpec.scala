package graft

import org.apache.spark.sql.functions._

/** Event-time-timeout session assembly (st05): watermark-closed sessions
  * must emit, and every emitted session must be internally consistent and
  * agree with batch gap-sessionization on the closed (non-tail) region.
  */
class TimeoutSessionsSpec extends SparkSpec {

  lazy val out = SparkEntry
    .queries("st05_stream_timeout_sessions")(spark, sf).cache()

  test("watermark-closed sessions emit") {
    assert(out.count() > 0)
  }

  test("sessions are well-formed") {
    assert(out.filter(col("session_end") < col("session_start"))
      .count() == 0)
    assert(out.filter(col("n_events") < 1).count() == 0)
  }

  test("closed region equals batch gap-sessionization exactly") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
    val gapUs = 30 * 60000000L
    val sessions = events
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev"))) > gapUs, 1)
          .otherwise(0))
      .withColumn("seq", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "seq")
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"), count(lit(1)).as("n_events"))
    val maxUs = events.agg(max(unix_micros(col("ts")))).head.getLong(0)
    // same closed-region bound as the declared query + its oracle
    val expected = sessions
      .filter(unix_micros(col("session_end")) <
        maxUs - 3600000000L - gapUs - 1000000L)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
    val got = out.select(col("user_id"),
      col("session_start").cast("timestamp").as("session_start"),
      col("session_end").cast("timestamp").as("session_end"),
      col("n_events"))
    val missing = expected.exceptAll(got)
    val phantom = got.exceptAll(expected)
    assert(missing.count() == 0, "missing: " +
      missing.take(3).mkString("\n"))
    assert(phantom.count() == 0, "phantom: " +
      phantom.take(3).mkString("\n"))
  }
}
