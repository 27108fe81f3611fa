package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Degenerate-events robustness: the event-analytics family must
  * survive the streams a real firehose contains — one hyperactive user,
  * batches of identical timestamps, NULL/empty/garbage JSON props,
  * zero/negative values, and a single-event user — without crashing.
  * Only events-only queries run here (joined queries need the full
  * star schema the driver generates).
  */
class EdgeEventsSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("edgeevents").toString
    def ts(s: String) = Timestamp.valueOf(s)
    val base = "2025-03-01 00:00:00"
    val rows =
      // one hyperactive user: 50 events at the SAME instant
      (1L to 50L).map(i => (i, ts(base), 1L, "view", 1.0,
        """{"k":"v"}""")) ++
      // a session chain with odd props
      Seq(
        (101L, ts("2025-03-01 01:00:00"), 2L, "view", 0.0, null),
        (102L, ts("2025-03-01 01:00:01"), 2L, "cart", -5.0, ""),
        (103L, ts("2025-03-01 01:00:02"), 2L, "purchase", 1e12,
          "not json at all"),
        (104L, ts("2025-03-02 23:59:59"), 3L, "view", 0.5,
          """{"nested":{"deep":1}}"""))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    df.coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private val eventOnly = Seq(
    "e01_tumbling_window", "e02_sessionize", "e03_json_props",
    "e04_funnel", "e05_retention_cohorts", "e06_hopping_window",
    "e07_rolling_actives", "e09_conversion_rates",
    "e10_event_transitions", "e11_volume_zscore", "e12_rfm_segments",
    "e13_type_cooccurrence")

  test("event-family queries survive a degenerate firehose") {
    for (name <- eventOnly) {
      val rows =
        try SparkEntry.queries(name)(spark, dir).collect()
        catch { case e: Throwable =>
          fail(s"$name crashed on degenerate events: ${e.getMessage}")
        }
      spark.catalog.clearCache()
      assert(rows != null, name)
    }
  }

  test("identical-timestamp burst sessionizes into one session") {
    val sessions = SparkEntry.queries("e02_sessionize")(spark, dir)
      .filter(col("user_id") === 1L)
      .select(col("session_seq")).distinct().count()
    spark.catalog.clearCache()
    assert(sessions == 1L,
      s"50 same-instant events must form one session, got $sessions")
  }
}
