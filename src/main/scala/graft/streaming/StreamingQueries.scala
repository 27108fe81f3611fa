package graft.streaming

import graft.QueryDef
import graft.functions.Money.sqlSum
import org.apache.spark.sql.functions._

/** Declared streaming queries: each runs a real Structured Streaming job
  * (file source → watermark → event-time aggregation → memory sink) and is
  * oracle-checked against the equivalent batch SQL — streaming/batch
  * unification is the whole point of expressing these on Spark.
  */
object StreamingQueries {

  def defs: Map[String, QueryDef] = Map(

    // ── Watermarked tumbling-window aggregate (streaming twin of e01)
    "st01_stream_tumbling" -> QueryDef(
      (s, d) => {
        val agg = EventStream.tumblingCounts(EventStream.readEvents(s, d))
        EventStream.runToMemory(s, agg, s"st01_sink_${System.nanoTime}")
          .select(
            col("window.start").cast("timestamp_ntz").as("window_start"),
            col("window.end").cast("timestamp_ntz").as("window_end"),
            col("event_type"), col("n_events"), col("total_value"))
          .orderBy("window_start", "event_type")
      },
      Some(s"""SELECT
              CAST(to_timestamp((epoch_us(ts) // 21600000000) * 21600000000 / 1000000) AS TIMESTAMP)
                AS window_start,
              CAST(to_timestamp(((epoch_us(ts) // 21600000000) + 1) * 21600000000 / 1000000) AS TIMESTAMP)
                AS window_end,
              event_type, count(*) AS n_events,
              ${sqlSum("value")} AS total_value
              FROM events GROUP BY 1, 2, 3
              ORDER BY window_start, event_type"""),
      "Structured Streaming tumbling windows == batch groupBy (unification)"),

    // ── Watermarked session windows (streaming twin of e02's gap logic)
    "st02_stream_sessions" -> QueryDef(
      (s, d) => {
        val agg = EventStream.sessionCounts(EventStream.readEvents(s, d))
        EventStream.runToMemory(s, agg, s"st02_sink_${System.nanoTime}")
          .select(
            col("session_window.start").cast("timestamp_ntz")
              .as("session_start"),
            col("session_window.end").cast("timestamp_ntz")
              .as("session_end"),
            col("user_id"), col("n_events"))
          .orderBy("user_id", "session_start")
      },
      Some("""
WITH marked AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts, 1) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM marked
)
SELECT min(ts) AS session_start,
  max(ts) + INTERVAL 30 MINUTE AS session_end,
  user_id, count(*) AS n_events
FROM sessions GROUP BY user_id, session_seq
ORDER BY user_id, session_start"""),
      "session_window streaming aggregation == batch gap sessionization"))
}
