package graft.operators

import graft.Tables
import graft.functions.{Cleaning, DateTimeFns, Money, Waterfall}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagship pipeline: the reference's loan-detail job
  * (`/root/reference/extract_loan_detail.py`) transposed onto the testdata
  * star schema. `orders` stands in for loans, `lineitem` for the three
  * payment channels (returnflag N=arcus, R=stripe, A=cash), `l_suppkey%15`
  * for collections strategies.
  *
  * Shape (and why it scales): the reference materializes ~15 full pandas
  * intermediates in one thread. Here the whole job is one lazy plan —
  * channel aggregates are map-side-combined hash aggregates *before* the
  * 5-way left join (same manual pre-aggregation the reference does, which
  * is also the right distributed shape: the join keys are the aggregate
  * output keys, so each shuffle is on already-reduced data). The waterfall
  * and settlement logic are pure expression trees inside whole-stage
  * codegen; nothing touches the driver.
  */
object LoanDetail {
  import Money.{moneyRound, moneySum, sqlRound, sqlSum}

  /** Deterministic "today" for DPD — never wall-clock in a declared query
    * (reference uses `datetime.now()`, `extract_loan_detail.py:331`).
    */
  val AsOf = "2002-01-01 00:00:00"

  private val postDdStrategies = Seq(3, 4, 10, 11, 12, 13)

  /** Loan-shaped projection of `orders` (reference `:15-78`): decode CASEs,
    * derived fee/late-fee with 16% tax, status filter.
    */
  def loans(spark: SparkSession, dir: String): DataFrame = {
    val fee = moneyRound(col("o_totalprice") * 0.05d)
    val isLate = when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
      .otherwise(0)
    val lateFee = when(isLate === 1, moneyRound(col("o_totalprice") * 0.02d))
      .otherwise(0d)
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").as("UserLoanIdNum"),
        col("o_custkey").as("UserIdNum"),
        col("o_orderdate").as("IssueDate"),
        (col("o_orderdate") + expr("INTERVAL 14 DAYS")).as("DueDate"),
        when(col("o_orderstatus") === "F", 2)
          .when(col("o_orderstatus") === "O", 1)
          .otherwise(4).as("LoanStatus"),
        when(col("o_orderpriority") === "1-URGENT", "Urgent")
          .when(col("o_orderpriority") === "2-HIGH", "High")
          .when(col("o_orderpriority") === "3-MEDIUM", "Medium")
          .when(col("o_orderpriority") === "5-LOW", "Low")
          .otherwise("Unspecified").as("OfferPolicyName"),
        moneyRound(col("o_totalprice")).as("PrincipalAmount"),
        fee.as("Fee"),
        moneyRound(fee * 0.16d).as("TaxOnFee"),
        isLate.as("IsLate"),
        lateFee.as("LateFee"),
        moneyRound(lateFee * 0.16d).as("TaxOnLateFee"))
      .filter(!col("LoanStatus").isin(6)) // reference `:75-76`
  }

  /** One payment channel: pre-aggregated per-loan sum/max (reference
    * `:82-134`, A1/A2/A4). Partial aggregation happens map-side, so the
    * shuffle ships one row per (channel, loan) — this is what keeps the
    * 5-way join cheap at scale.
    */
  private def channel(li: DataFrame, flag: String, suffix: String): DataFrame =
    li.filter(col("l_returnflag") === flag)
      .groupBy(col("l_orderkey").as("UserLoanIdNum"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .as(s"AmountPaid$suffix"),
        max(col("l_shipdate")).as(s"LastPaidAt$suffix"))

  /** Conditional dispute aggregate (A3, reference `:110-120`). */
  private def disputes(li: DataFrame): DataFrame =
    li.filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey").as("UserLoanIdNum"))
      .agg(moneySum(
        when(col("l_linestatus") === "F",
          col("l_extendedprice") * col("l_discount")).otherwise(0d))
        .as("DisputeAmount"))

  /** Latest collections strategy per loan: J8 fan-out left join + W2
    * window dedup (reference `:306-352`).
    */
  private def latestStrategy(li: DataFrame): DataFrame = {
    val w = Window.partitionBy("UserLoanIdNum")
      .orderBy(desc("StrategyCreatedAt"), desc("Strategy"))
    li.select(
        col("l_orderkey").as("UserLoanIdNum"),
        col("l_shipdate").as("StrategyCreatedAt"),
        (col("l_suppkey") % 15).as("Strategy"))
      .filter(col("Strategy").isin(postDdStrategies: _*))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** The declared flagship result: [[detail]] in deterministic (numeric
    * id) order, matching the oracle's `ORDER BY UserLoanIdNum`.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame =
    detail(spark, dir).orderBy(col("UserLoanId").cast("bigint"))

  /** The loan-detail frame WITHOUT the final global sort — the entry point
    * for downstream aggregations (reporting_monthly): a consumer that
    * groups or joins must not pay the range-partition shuffle a
    * deterministic ordering costs, and a persist() boundary between the
    * two would otherwise freeze the sort into the cached plan where no
    * optimizer rule can elide it.
    */
  def detail(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val base = loans(spark, dir)
      .join(channel(li, "N", "Arcus"), Seq("UserLoanIdNum"), "left")
      .join(channel(li, "R", "Stripe"), Seq("UserLoanIdNum"), "left")
      .join(channel(li, "A", "Cash"), Seq("UserLoanIdNum"), "left")
      .join(disputes(li), Seq("UserLoanIdNum"), "left")
      .na.fill(0d, Seq("AmountPaidArcus", "AmountPaidStripe",
        "AmountPaidCash", "DisputeAmount")) // P13, reference `:162-165`

    val withTotals = base
      .withColumn("TotalAmountDue",
        col("PrincipalAmount") + col("Fee") + col("TaxOnFee") +
          col("LateFee") + col("TaxOnLateFee"))
      .withColumn("TotalOriginalAmountPaid",
        col("AmountPaidArcus") + col("AmountPaidStripe") +
          col("AmountPaidCash") - col("DisputeAmount"))
      // P12 underpayment bump to due for repaid loans (reference `:191-195`)
      .withColumn("TotalAmountPaid",
        when(col("TotalOriginalAmountPaid") < col("TotalAmountDue") &&
          col("LoanStatus") === 2, col("TotalAmountDue"))
          .otherwise(col("TotalOriginalAmountPaid")))

    val apportioned = Waterfall(withTotals) // U1

    val settled = apportioned
      // W3: pandas max(axis=1) skips NaN; greatest() skips NULLs — matches.
      .withColumn("LastPaidDate",
        greatest(col("LastPaidAtArcus"), col("LastPaidAtStripe"),
          col("LastPaidAtCash")))
      .withColumn("LastPaidDateCDMX",
        DateTimeFns.toCdmx(col("LastPaidDate")).cast("timestamp_ntz"))
      // settlement chain (reference `:249-267`)
      .withColumn("SettledAt",
        when(col("LoanStatus") === 2 && col("LastPaidDate").isNotNull,
          col("LastPaidDate"))
          .when(col("LoanStatus") === 2 && col("LastPaidDate").isNull,
            col("DueDate"))
          .otherwise(lit(null).cast("timestamp_ntz")))
      .withColumn("SettledAtCDMX",
        when(col("LoanStatus") === 2 && col("LastPaidDate").isNotNull,
          DateTimeFns.toCdmx(col("LastPaidDate")).cast("timestamp_ntz"))
          .when(col("LoanStatus") === 2 && col("LastPaidDate").isNull,
            col("DueDate")) // tz_localize(CDMX): wall clock unchanged
          .otherwise(lit(null).cast("timestamp_ntz")))

    val wSeq = Window.partitionBy("UserIdNum")
      .orderBy(col("IssueDate"), col("UserLoanIdNum"))
    val days: (String, String) => org.apache.spark.sql.Column = (a, b) =>
      floor((unix_millis(col(a).cast("timestamp")) -
        unix_millis(col(b).cast("timestamp"))) / lit(86400000d))
    val cohorted = settled
      .withColumn("LoanNumber", row_number().over(wSeq).cast("bigint")) // W1
      .withColumn("LoanCohort",
        when(col("LoanNumber") === 1, "First").otherwise("Repeat"))
      // F9 day diff as pandas `.dt.days` (floor of exact delta), P14 clip
      .withColumn("DaysLate",
        greatest(
          when(col("SettledAt").isNotNull, days("SettledAtCDMX", "DueDate"))
            .otherwise(
              floor((unix_millis(lit(AsOf).cast("timestamp")) -
                unix_millis(col("DueDate").cast("timestamp"))) /
                lit(86400000d))),
          lit(0L)))

    val strategized = cohorted
      .join(latestStrategy(li), Seq("UserLoanIdNum"), "left")
      .withColumn("StrategyName",
        when(col("Strategy") === 3, "EarlyCall")
          .when(col("Strategy") === 4, "LateCall")
          .when(col("Strategy") === 10, "SMS")
          .when(col("Strategy") === 11, "Email")
          .when(col("Strategy") === 12, "WhatsApp")
          .when(col("Strategy") === 13, "Field"))
      .withColumn("StrategyName",
        coalesce(col("StrategyName"), lit("Twilio"))) // P13 `:374`

    strategized
      .select(
        Cleaning.idString(col("UserLoanIdNum")).as("UserLoanId"), // P15
        Cleaning.idString(col("UserIdNum")).as("UserId"),
        col("IssueDate"), col("DueDate"),
        col("LoanStatus").cast("int").as("LoanStatus"),
        col("OfferPolicyName"),
        col("PrincipalAmount"), col("Fee"), col("TaxOnFee"),
        col("IsLate").cast("int").as("IsLate"),
        col("LateFee"), col("TaxOnLateFee"),
        col("AmountPaidArcus"), col("AmountPaidStripe"),
        col("AmountPaidCash"), col("DisputeAmount"),
        col("TotalAmountDue"), col("TotalOriginalAmountPaid"),
        col("TotalAmountPaid"),
        col("PrincipalPaid"), col("FeePaid"), col("TaxOnFeePaid"),
        col("LateFeePaid"), col("TaxOnLateFeePaid"),
        col("LastPaidDate"), col("LastPaidDateCDMX"),
        col("SettledAt"), col("SettledAtCDMX"),
        col("LoanNumber"), col("LoanCohort"), col("DaysLate"),
        col("Strategy").cast("bigint").as("Strategy"),
        col("StrategyCreatedAt"), col("StrategyName"))
  }

  /** DuckDB oracle — the same program in ANSI SQL, kept in textual lockstep
    * with [[pipeline]].
    */
  val oracle: String = {
    val cdmx = DateTimeFns.sqlToCdmx _
    def days(a: String, b: String): String =
      s"CAST(floor((epoch_ms($a) - epoch_ms($b)) / 86400000.0) AS BIGINT)"
    s"""
WITH loans0 AS (
  SELECT o_orderkey AS UserLoanIdNum, o_custkey AS UserIdNum,
    o_orderdate AS IssueDate,
    o_orderdate + INTERVAL 14 DAY AS DueDate,
    CASE WHEN o_orderstatus = 'F' THEN 2 WHEN o_orderstatus = 'O' THEN 1
         ELSE 4 END AS LoanStatus,
    CASE WHEN o_orderpriority = '1-URGENT' THEN 'Urgent'
         WHEN o_orderpriority = '2-HIGH' THEN 'High'
         WHEN o_orderpriority = '3-MEDIUM' THEN 'Medium'
         WHEN o_orderpriority = '5-LOW' THEN 'Low'
         ELSE 'Unspecified' END AS OfferPolicyName,
    o_totalprice AS RawPrincipal,
    ${sqlRound("o_totalprice")} AS PrincipalAmount,
    ${sqlRound("o_totalprice * 0.05")} AS Fee,
    CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0
         END AS IsLate
  FROM orders
),
loans1 AS (
  SELECT *, ${sqlRound("Fee * 0.16")} AS TaxOnFee,
    CASE WHEN IsLate = 1 THEN ${sqlRound("RawPrincipal * 0.02")}
         ELSE 0.0 END AS LateFee
  FROM loans0
),
loans AS (
  SELECT *, ${sqlRound("LateFee * 0.16")} AS TaxOnLateFee
  FROM loans1 WHERE LoanStatus NOT IN (6)
),
arcus AS (
  SELECT l_orderkey AS UserLoanIdNum,
    ${sqlSum("l_extendedprice * (1 - l_discount)")} AS AmountPaidArcus,
    max(l_shipdate) AS LastPaidAtArcus
  FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1
),
stripe AS (
  SELECT l_orderkey AS UserLoanIdNum,
    ${sqlSum("l_extendedprice * (1 - l_discount)")} AS AmountPaidStripe,
    max(l_shipdate) AS LastPaidAtStripe
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
),
cash AS (
  SELECT l_orderkey AS UserLoanIdNum,
    ${sqlSum("l_extendedprice * (1 - l_discount)")} AS AmountPaidCash,
    max(l_shipdate) AS LastPaidAtCash
  FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1
),
disputes AS (
  SELECT l_orderkey AS UserLoanIdNum,
    ${sqlSum("CASE WHEN l_linestatus = 'F' THEN l_extendedprice * l_discount ELSE 0 END")} AS DisputeAmount
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
),
base AS (
  SELECT l.*, coalesce(a.AmountPaidArcus, 0) AS AmountPaidArcus,
    a.LastPaidAtArcus,
    coalesce(s.AmountPaidStripe, 0) AS AmountPaidStripe, s.LastPaidAtStripe,
    coalesce(c.AmountPaidCash, 0) AS AmountPaidCash, c.LastPaidAtCash,
    coalesce(d.DisputeAmount, 0) AS DisputeAmount
  FROM loans l
  LEFT JOIN arcus a USING (UserLoanIdNum)
  LEFT JOIN stripe s USING (UserLoanIdNum)
  LEFT JOIN cash c USING (UserLoanIdNum)
  LEFT JOIN disputes d USING (UserLoanIdNum)
),
totals0 AS (
  SELECT *,
    PrincipalAmount + Fee + TaxOnFee + LateFee + TaxOnLateFee
      AS TotalAmountDue,
    AmountPaidArcus + AmountPaidStripe + AmountPaidCash - DisputeAmount
      AS TotalOriginalAmountPaid
  FROM base
),
totals AS (
  SELECT *,
    CASE WHEN TotalOriginalAmountPaid < TotalAmountDue AND LoanStatus = 2
         THEN TotalAmountDue ELSE TotalOriginalAmountPaid
         END AS TotalAmountPaid
  FROM totals0
),
apportioned AS (
  SELECT *,
    ${Waterfall.oracleSelectList("TotalAmountPaid", "TotalAmountDue",
        "LateFee", "TaxOnLateFee", "Fee", "TaxOnFee", "PrincipalAmount")}
  FROM totals
),
settled AS (
  SELECT *,
    greatest(LastPaidAtArcus, LastPaidAtStripe, LastPaidAtCash)
      AS LastPaidDate,
    ${cdmx("greatest(LastPaidAtArcus, LastPaidAtStripe, LastPaidAtCash)")}
      AS LastPaidDateCDMX,
    CASE WHEN LoanStatus = 2 AND greatest(LastPaidAtArcus, LastPaidAtStripe, LastPaidAtCash) IS NOT NULL
           THEN greatest(LastPaidAtArcus, LastPaidAtStripe, LastPaidAtCash)
         WHEN LoanStatus = 2 THEN DueDate END AS SettledAt,
    CASE WHEN LoanStatus = 2 AND greatest(LastPaidAtArcus, LastPaidAtStripe, LastPaidAtCash) IS NOT NULL
           THEN ${cdmx("greatest(LastPaidAtArcus, LastPaidAtStripe, LastPaidAtCash)")}
         WHEN LoanStatus = 2 THEN DueDate END AS SettledAtCDMX
  FROM apportioned
),
cohorted AS (
  SELECT *,
    row_number() OVER (PARTITION BY UserIdNum
      ORDER BY IssueDate, UserLoanIdNum) AS LoanNumber,
    greatest(
      CASE WHEN SettledAt IS NOT NULL
             THEN ${days("SettledAtCDMX", "DueDate")}
           ELSE ${days(s"TIMESTAMP '$AsOf'", "DueDate")} END,
      0) AS DaysLate
  FROM settled
),
strategies AS (
  SELECT UserLoanIdNum, StrategyCreatedAt, Strategy FROM (
    SELECT l_orderkey AS UserLoanIdNum, l_shipdate AS StrategyCreatedAt,
      l_suppkey % 15 AS Strategy,
      row_number() OVER (PARTITION BY l_orderkey
        ORDER BY l_shipdate DESC, l_suppkey % 15 DESC) AS rn
    FROM lineitem WHERE l_suppkey % 15 IN (3,4,10,11,12,13))
  WHERE rn = 1
)
SELECT
  ${Cleaning.sqlIdString("t.UserLoanIdNum")} AS UserLoanId,
  ${Cleaning.sqlIdString("t.UserIdNum")} AS UserId,
  t.IssueDate, t.DueDate,
  CAST(t.LoanStatus AS INTEGER) AS LoanStatus,
  t.OfferPolicyName, t.PrincipalAmount, t.Fee, t.TaxOnFee,
  CAST(t.IsLate AS INTEGER) AS IsLate,
  t.LateFee, t.TaxOnLateFee,
  t.AmountPaidArcus, t.AmountPaidStripe, t.AmountPaidCash, t.DisputeAmount,
  t.TotalAmountDue, t.TotalOriginalAmountPaid, t.TotalAmountPaid,
  t.PrincipalPaid, t.FeePaid, t.TaxOnFeePaid, t.LateFeePaid,
  t.TaxOnLateFeePaid,
  t.LastPaidDate, t.LastPaidDateCDMX, t.SettledAt, t.SettledAtCDMX,
  CAST(t.LoanNumber AS BIGINT) AS LoanNumber,
  CASE WHEN t.LoanNumber = 1 THEN 'First' ELSE 'Repeat' END AS LoanCohort,
  t.DaysLate,
  CAST(st.Strategy AS BIGINT) AS Strategy,
  st.StrategyCreatedAt,
  coalesce(
    CASE WHEN st.Strategy = 3 THEN 'EarlyCall'
         WHEN st.Strategy = 4 THEN 'LateCall'
         WHEN st.Strategy = 10 THEN 'SMS'
         WHEN st.Strategy = 11 THEN 'Email'
         WHEN st.Strategy = 12 THEN 'WhatsApp'
         WHEN st.Strategy = 13 THEN 'Field' END,
    'Twilio') AS StrategyName
FROM cohorted t
LEFT JOIN strategies st USING (UserLoanIdNum)
ORDER BY t.UserLoanIdNum
"""
  }
}
