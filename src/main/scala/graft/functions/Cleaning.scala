package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String-cleaning scalar functions (the reference's `clean_numeric` and
  * id-normalization idioms), as pure codegen-friendly expressions.
  */
object Cleaning {
  /** `clean_numeric` (`/root/reference/extract_growth_data.py:38-49`):
    * strip `$` and `,`, trim, empty string -> NULL, cast to double.
    */
  def cleanNumeric(c: Column): Column = {
    val stripped = trim(regexp_replace(c, "[$,]", ""))
    when(stripped === "", lit(null)).otherwise(stripped).cast("double")
  }

  /** DuckDB spelling of [[cleanNumeric]]. */
  def sqlCleanNumeric(expr: String): String =
    s"CAST(nullif(trim(regexp_replace($expr, '[$$,]', '', 'g')), '') AS DOUBLE)"

  /** Int-roundtrip id cast (`/root/reference/extract_arcus_transactions.py:62-67`):
    * `str(int(x)) if notnull else None` — avoids `"1234.0"` strings when a
    * numeric id column picked up a float dtype.
    */
  def idString(c: Column): Column = c.cast("bigint").cast("string")

  /** DuckDB spelling of [[idString]]. `trunc` first: Spark's double→bigint
    * cast truncates toward zero while DuckDB's rounds, so a bare CAST
    * would disagree on any float-dtype id with a fractional part.
    */
  def sqlIdString(expr: String): String =
    s"CAST(CAST(trunc($expr) AS BIGINT) AS VARCHAR)"
}
