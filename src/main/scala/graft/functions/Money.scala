package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Money arithmetic with cross-engine deterministic rounding.
  *
  * The reference keeps money as binary doubles and rounds with
  * `round(x, 2)` (`/root/reference/extract_loan_detail.py:211-223`). Engines
  * disagree on double rounding at representation boundaries (Spark rounds the
  * decimal expansion HALF_UP, DuckDB rounds `x*100` half-away-from-zero), so
  * declared queries use `floor(x*100 + 0.5)/100`: pure IEEE-double arithmetic
  * that is bit-identical on any engine, and equals round-half-up on the
  * scaled double value.
  *
  * Sums of money are order-dependent in doubles (a distributed partial
  * aggregate adds in a different order than a single-threaded oracle), so
  * aggregated money goes through DecimalType(18,2) — exact, associative,
  * order-independent — and is cast back to double at the edge.
  */
object Money {
  /** Deterministic 2-dp half-up rounding on doubles; same bits on any
    * IEEE-754 engine. Oracle SQL spelling: `floor(x*100 + 0.5)/100`.
    */
  def moneyRound(c: Column): Column = floor(c * 100d + 0.5d) / 100d

  /** Exact, order-independent money sum: round terms to cents, sum as
    * decimal, surface as double. Oracle SQL spelling:
    * `CAST(SUM(CAST(floor(x*100+0.5)/100 AS DECIMAL(18,2))) AS DOUBLE)`.
    */
  def moneySum(c: Column): Column =
    sum(moneyRound(c).cast(DecimalType(18, 2))).cast("double")

  /** SQL fragment builders so the DuckDB oracle strings stay in lockstep
    * with the Spark expressions above.
    */
  def sqlRound(expr: String): String = s"floor(($expr)*100 + 0.5)/100"
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(${sqlRound(expr)} AS DECIMAL(18,2))) AS DOUBLE)"
}
