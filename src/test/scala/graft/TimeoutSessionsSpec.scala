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

  test("emitted sessions match batch gap-sessionization where closed") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
    val gapMs = 30 * 60000L
    val sessions = events
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev"))) > gapMs, 1)
          .otherwise(0))
      .withColumn("seq", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "seq")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("last_ts"),
        count(lit(1)).as("n_events"))
    val maxTs = events.agg(max(unix_millis(col("ts")))).head.getLong(0)
    // strictly closed by the 1h watermark, with 1s margin for boundary
    // semantics (timeout fires when watermark passes last + gap)
    val mustEmit = sessions.filter(
      unix_millis(col("last_ts")) + gapMs < maxTs - 3600000L - 1000L)
    val emitted = out.select(col("user_id"),
      col("session_start").cast("timestamp").as("session_start"),
      col("n_events"))
    val missing = mustEmit
      .join(emitted, Seq("user_id", "session_start", "n_events"),
        "left_anti")
    assert(missing.count() == 0, missing.take(3).mkString("\n"))
    // and nothing emitted that batch sessionization doesn't recognize
    val phantom = emitted.join(
      sessions.select(col("user_id"), col("session_start"),
        col("n_events")),
      Seq("user_id", "session_start", "n_events"), "left_anti")
    assert(phantom.count() == 0, phantom.take(3).mkString("\n"))
  }
}
