package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timezone / calendar scalar helpers.
  *
  * The reference stores naive-UTC timestamps and derives `*CDMX` wall-clock
  * twins via `tz_localize('UTC').tz_convert('America/Mexico_City')`, then
  * strips tz before writing (`/root/reference/extract_loan_detail.py:139-155,
  * 275-276`). With the session timezone pinned to UTC, that is exactly
  * `from_utc_timestamp`.
  */
object DateTimeFns {
  val CdmxTz = "America/Mexico_City"

  /** Naive-UTC column -> CDMX wall-clock twin (F4/F5). */
  def toCdmx(c: Column): Column = from_utc_timestamp(c, CdmxTz)

  /** DuckDB spelling (needs ICU, which ships with the python wheel):
    * interpret as UTC, render CDMX wall clock.
    */
  def sqlToCdmx(expr: String): String =
    s"timezone('$CdmxTz', timezone('UTC', $expr))"

  /** Weekend payday adjuster (`/root/reference/create_calendar.py:51-58`):
    * Saturday -> Friday (-1 day), Sunday -> Friday (-2 days).
    * `dayofweek`: 1=Sunday ... 7=Saturday.
    *
    * DATE inputs only (every caller casts first): on a TIMESTAMP,
    * Spark's `date_sub` returns DATE (weekend times truncate to
    * midnight while weekday times survive), whereas the DuckDB twin's
    * `- INTERVAL` preserves time-of-day — a silent cross-engine
    * divergence. Cast to DATE before calling.
    */
  def weekendToFriday(c: Column): Column =
    when(dayofweek(c) === 7, date_sub(c, 1))
      .when(dayofweek(c) === 1, date_sub(c, 2))
      .otherwise(c)

  /** DuckDB spelling; `dayofweek` there is 0=Sunday ... 6=Saturday. */
  def sqlWeekendToFriday(expr: String): String =
    s"""CASE WHEN dayofweek($expr) = 6 THEN ($expr) - INTERVAL 1 DAY
       |     WHEN dayofweek($expr) = 0 THEN ($expr) - INTERVAL 2 DAY
       |     ELSE ($expr) END""".stripMargin
}
