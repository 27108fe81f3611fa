package graft.operators

import graft.QueryDef
import graft.functions.DateTimeFns
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** U6 — the calendar-dimension generator
  * (`/root/reference/create_calendar.py:36-84`), the reference's only
  * table-valued producer. The Python day-loop becomes
  * `sequence` + `explode` (a Spark Generator): fully distributed, no
  * driver-side row building.
  *
  * Quincena semantics (Mexican bi-monthly payroll): Q1 pays on the 15th,
  * Q2 on the last day of month, both shifted Sat→Fri / Sun→Fri. For each
  * day: its quincena is Q1-adjusted while `day <= q1_adj`, else
  * Q2-adjusted; the previous quincena is last month's Q2 for the first
  * half, Q1 for the second.
  */
object CalendarQueries {

  private val RangeStart = "2022-08-01"
  private val RangeEnd = "2025-12-31" // deterministic stand-in for "today"
  private val Keep = "2022-09-01"     // reference filters to Sept 2022+

  def defs: Map[String, QueryDef] = Map(
    "u06_calendar_dim" -> QueryDef(
      (s, d) => {
        val adj: Column => Column = DateTimeFns.weekendToFriday
        val day = col("DateDayD")
        val q1 = adj(make_date(year(day), month(day), lit(15)))
        val q2 = adj(last_day(day))
        val prevQ2 = adj(last_day(add_months(day, -1)))
        val quincena = when(day <= q1, q1).otherwise(q2)
        val prevQuincena = when(day <= q1, prevQ2).otherwise(q1)
        s.range(1)
          .select(explode(sequence(
            lit(RangeStart).cast("date"), lit(RangeEnd).cast("date"),
            expr("INTERVAL 1 DAY"))).as("DateDayD"))
          .filter(day >= lit(Keep).cast("date"))
          .select(
            date_trunc("month", day).cast("timestamp_ntz").as("DateMonth"),
            day.cast("timestamp_ntz").as("DateDay"),
            quincena.cast("timestamp_ntz").as("Quincena"),
            (day === quincena).as("IsQuincena"),
            prevQuincena.cast("timestamp_ntz").as("PrevQuincena"),
            date_format(day, "EEEE").as("DayOfWeek"),
            datediff(day, quincena).cast("bigint")
              .as("DayRelativeToQuincena"))
          .orderBy("DateDay")
      },
      Some {
        val adj = DateTimeFns.sqlWeekendToFriday _
        val q1 = s"CAST(${adj("make_date(year(d), month(d), 15)")} AS DATE)"
        val q2 = s"CAST(${adj("last_day(d)")} AS DATE)"
        val prevQ2 =
          s"CAST(${adj("last_day(CAST(d - INTERVAL 1 MONTH AS DATE))")} AS DATE)"
        s"""
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '$RangeStart', DATE '$RangeEnd',
      INTERVAL 1 DAY)) AS DATE) AS d
),
q AS (
  SELECT d, $q1 AS q1, $q2 AS q2, $prevQ2 AS prev_q2
  FROM days WHERE d >= DATE '$Keep'
)
SELECT
  CAST(date_trunc('month', d) AS TIMESTAMP) AS DateMonth,
  CAST(d AS TIMESTAMP) AS DateDay,
  CAST(CASE WHEN d <= q1 THEN q1 ELSE q2 END AS TIMESTAMP) AS Quincena,
  d = (CASE WHEN d <= q1 THEN q1 ELSE q2 END) AS IsQuincena,
  CAST(CASE WHEN d <= q1 THEN prev_q2 ELSE q1 END AS TIMESTAMP)
    AS PrevQuincena,
  strftime(d, '%A') AS DayOfWeek,
  CAST(date_diff('day', CASE WHEN d <= q1 THEN q1 ELSE q2 END, d) AS BIGINT)
    AS DayRelativeToQuincena
FROM q ORDER BY DateDay
"""
      },
      "U6: distributed calendar generator with quincena payroll attributes"))
}
