package graft

import graft.functions.DateTimeFns
import org.apache.spark.sql.functions._

/** Pins the timezone facts the CDMX conversions depend on, against literal
  * expected values (not the oracle — both engines share the tz database,
  * so an oracle diff can't catch a wrong shared assumption).
  */
class DateTimeFnsSpec extends SparkSpec {
  import spark.implicits._

  private def cdmx(utc: String): String =
    Seq(utc).toDF("ts")
      .select(DateTimeFns.toCdmx(col("ts").cast("timestamp"))
        .cast("string"))
      .collect().head.getString(0)

  test("CDMX offset: DST era (pre-2022) summer -5, winter -6") {
    assert(cdmx("1997-07-01 12:00:00") == "1997-07-01 07:00:00") // CDT
    assert(cdmx("1997-01-01 12:00:00") == "1997-01-01 06:00:00") // CST
  }

  test("CDMX offset: post-2022 (DST abolished) fixed -6 year-round") {
    assert(cdmx("2025-07-01 12:00:00") == "2025-07-01 06:00:00")
    assert(cdmx("2025-01-01 12:00:00") == "2025-01-01 06:00:00")
  }

  test("weekend payday adjuster maps Sat/Sun to the preceding Friday") {
    val got = Seq("2025-08-08", "2025-08-09", "2025-08-10", "2025-08-11")
      .toDF("d")
      .select(DateTimeFns.weekendToFriday(col("d").cast("date"))
        .cast("string"))
      .as[String].collect().toSeq
    // Fri stays, Sat -1, Sun -2, Mon stays
    assert(got == Seq("2025-08-08", "2025-08-08", "2025-08-08",
      "2025-08-11"))
  }
}
