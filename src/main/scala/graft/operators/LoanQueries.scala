package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{Money, Waterfall}
import org.apache.spark.sql.functions._

/** Declared queries for the loan-domain pipeline (SURVEY.md §2 rows
  * exercised end-to-end: E1/J7/A1-A4/U1/U2/W1-W3/P12-P15/F9).
  */
object LoanQueries {
  import Money.{moneyRound, sqlRound}

  def defs: Map[String, QueryDef] = Map(
    "loan_detail" -> QueryDef(
      (s, d) => LoanDetail.pipeline(s, d),
      Some(LoanDetail.oracle),
      "E1 flagship: scan→filter→pre-agg→5-way left join→waterfall→window→project"),

    // ── Amortization schedule: explode each loan into its 12 monthly
    // installments with level principal and simple interest on the
    // declining balance — the schedule generator the reference's
    // lending domain implies but never ships (its loans carry only the
    // current state). Closed-form per period (no iterative balance:
    // balance_k = P − (k−1)·round(P/12)), so everything is one map-side
    // explode of cent-exact arithmetic; the last period absorbs the
    // rounding residue so the principal column sums back to P exactly.
    "u07_amortization" -> QueryDef(
      (s, d) => {
        val P = moneyRound(col("o_totalprice"))
        val inst = moneyRound(P / 12d)
        Tables.orders(s, d)
          .select(col("o_orderkey").as("loan_id"), P.as("principal"),
            inst.as("inst"))
          .withColumn("period", explode(expr("sequence(1, 12)")))
          .withColumn("balance",
            moneyRound(col("principal") - (col("period") - 1) * col("inst")))
          .withColumn("principal_due",
            when(col("period") < 12, col("inst"))
              .otherwise(moneyRound(col("principal") - lit(11d) * col("inst"))))
          .withColumn("interest_due", moneyRound(col("balance") * 0.015d))
          .withColumn("total_due",
            moneyRound(col("principal_due") + col("interest_due")))
          .select(col("loan_id"), col("period").cast("bigint").as("period"),
            col("balance"), col("principal_due"), col("interest_due"),
            col("total_due"))
          .orderBy("loan_id", "period")
      },
      Some(s"""
WITH base AS (
  SELECT o_orderkey AS loan_id,
    ${sqlRound("o_totalprice")} AS principal,
    ${sqlRound(sqlRound("o_totalprice") + " / 12")} AS inst
  FROM orders
),
e AS (
  SELECT loan_id, principal, inst,
    unnest(generate_series(1, 12)) AS period
  FROM base
)
SELECT loan_id, CAST(period AS BIGINT) AS period,
  ${sqlRound("principal - (period - 1) * inst")} AS balance,
  CASE WHEN period < 12 THEN inst
       ELSE ${sqlRound("principal - 11 * inst")} END AS principal_due,
  ${sqlRound(sqlRound("principal - (period - 1) * inst") + " * 0.015")}
    AS interest_due,
  ${sqlRound(
    s"(CASE WHEN period < 12 THEN inst ELSE ${sqlRound("principal - 11 * inst")} END)" +
      s" + ${sqlRound(sqlRound("principal - (period - 1) * inst") + " * 0.015")}")}
    AS total_due
FROM e ORDER BY loan_id, period"""),
      "closed-form 12-period amortization explode, cent-exact residue"),

    // ── U1 standalone: the payment waterfall over loan-shaped inputs whose
    // paid amount sweeps 0%..149% of due, hitting every allocation branch
    // (reference `extract_loan_detail.py:198-234`).
    "u01_waterfall" -> QueryDef(
      (s, d) => {
        val base = Tables.orders(s, d).select(
          col("o_orderkey").as("UserLoanId"),
          moneyRound(col("o_totalprice")).as("PrincipalAmount"),
          moneyRound(col("o_totalprice") * 0.05d).as("Fee"),
          moneyRound(moneyRound(col("o_totalprice") * 0.05d) * 0.16d)
            .as("TaxOnFee"),
          when(col("o_custkey") % 3 === 0,
            moneyRound(col("o_totalprice") * 0.02d)).otherwise(0d)
            .as("LateFee"))
          .withColumn("TaxOnLateFee", moneyRound(col("LateFee") * 0.16d))
          .withColumn("TotalAmountDue",
            col("PrincipalAmount") + col("Fee") + col("TaxOnFee") +
              col("LateFee") + col("TaxOnLateFee"))
          .withColumn("TotalAmountPaid",
            moneyRound(col("TotalAmountDue") *
              ((col("UserLoanId") % 150).cast("double") / 100d)))
        Waterfall(base)
          .select(col("UserLoanId"), col("TotalAmountDue"),
            col("TotalAmountPaid"), col("PrincipalPaid"), col("FeePaid"),
            col("TaxOnFeePaid"), col("LateFeePaid"), col("TaxOnLateFeePaid"))
          .orderBy("UserLoanId")
      },
      Some(s"""
WITH base0 AS (
  SELECT o_orderkey AS UserLoanId,
    ${sqlRound("o_totalprice")} AS PrincipalAmount,
    ${sqlRound("o_totalprice * 0.05")} AS Fee,
    ${sqlRound(s"(${sqlRound("o_totalprice * 0.05")}) * 0.16")} AS TaxOnFee,
    CASE WHEN o_custkey % 3 = 0 THEN ${sqlRound("o_totalprice * 0.02")}
         ELSE 0.0 END AS LateFee
  FROM orders
),
base1 AS (
  SELECT *, ${sqlRound("LateFee * 0.16")} AS TaxOnLateFee FROM base0
),
base2 AS (
  SELECT *, PrincipalAmount + Fee + TaxOnFee + LateFee + TaxOnLateFee
    AS TotalAmountDue FROM base1
),
base AS (
  SELECT *,
    ${sqlRound("TotalAmountDue * (CAST(UserLoanId % 150 AS DOUBLE) / 100)")}
      AS TotalAmountPaid
  FROM base2
)
SELECT UserLoanId, TotalAmountDue, TotalAmountPaid,
  PrincipalPaid, FeePaid, TaxOnFeePaid, LateFeePaid, TaxOnLateFeePaid
FROM (SELECT *,
  ${Waterfall.oracleSelectList("TotalAmountPaid", "TotalAmountDue",
        "LateFee", "TaxOnLateFee", "Fee", "TaxOnFee", "PrincipalAmount")}
  FROM base)
ORDER BY UserLoanId"""),
      "U1: waterfall apportionment as a codegen expression tree"),

    // ── U2 standalone: conditional timestamp patch
    // (reference `extract_loan_detail.py:354-372`): post-DD strategies with
    // missing or threshold-class timestamps fall back to due date + 30h.
    "u02_timestamp_patch" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_suppkey") % 15).as("strategy"),
          (col("l_returnflag") === "N").as("is_post_dd"),
          when(col("l_linestatus") === "F",
            lit(null).cast("timestamp_ntz")).otherwise(col("l_shipdate"))
            .as("created_at"),
          (col("o_orderdate") + expr("INTERVAL 14 DAYS")).as("due_date"))
        .withColumn("patched_at",
          when(col("is_post_dd") &&
            (col("created_at").isNull || col("strategy").isin(10, 11, 12)),
            col("due_date") + expr("INTERVAL 30 HOURS"))
            .otherwise(col("created_at")))
        .orderBy("l_orderkey", "l_linenumber", "strategy", "patched_at"),
      Some("""
WITH t AS (
  SELECT l_orderkey, l_linenumber,
    l_suppkey % 15 AS strategy,
    l_returnflag = 'N' AS is_post_dd,
    CASE WHEN l_linestatus = 'F' THEN NULL ELSE l_shipdate END
      AS created_at,
    o_orderdate + INTERVAL 14 DAY AS due_date
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT *,
  CASE WHEN is_post_dd AND (created_at IS NULL OR strategy IN (10,11,12))
       THEN due_date + INTERVAL 30 HOUR ELSE created_at END AS patched_at
FROM t
ORDER BY l_orderkey, l_linenumber, strategy, patched_at NULLS FIRST"""),
      "U2: conditional timestamp patch as pure expressions"))
}
