package graft

import graft.operators.LoanDetail
import org.apache.spark.sql.functions._

class LoanDetailSpec extends SparkSpec {

  lazy val out = LoanDetail.pipeline(spark, sf).cache()

  test("one row per loan, all loans present") {
    val nOrders = Tables.orders(spark, sf).count()
    assert(out.count() === nOrders)
    assert(out.select("UserLoanId").distinct().count() === nOrders)
  }

  test("waterfall invariants hold on every row") {
    val viol = out.withColumn("alloc",
        least(col("TotalAmountPaid"), col("TotalAmountDue")))
      .withColumn("parts",
        col("PrincipalPaid") + col("FeePaid") + col("TaxOnFeePaid") +
          col("LateFeePaid") + col("TaxOnLateFeePaid"))
      .filter(
        col("PrincipalPaid") < 0 || col("FeePaid") < 0 ||
        col("TaxOnFeePaid") < 0 || col("LateFeePaid") < 0 ||
        col("TaxOnLateFeePaid") < 0 ||
        col("PrincipalPaid") > col("PrincipalAmount") + 0.001 ||
        col("FeePaid") > col("Fee") + 0.001 ||
        col("LateFeePaid") > col("LateFee") + 0.001 ||
        abs(col("parts") - col("alloc")) > 0.02)
    assert(viol.count() === 0)
  }

  test("waterfall priority: principal only paid once fees covered") {
    val viol = out.filter(
      col("PrincipalPaid") > 0 &&
        (col("FeePaid") < col("Fee") - 0.001 ||
          col("LateFeePaid") < col("LateFee") - 0.001))
    assert(viol.count() === 0)
  }

  test("repaid loans (status 2) are settled, others are not") {
    assert(out.filter(col("LoanStatus") === 2 &&
      col("SettledAt").isNull).count() === 0)
    assert(out.filter(col("LoanStatus") =!= 2 &&
      col("SettledAt").isNotNull).count() === 0)
  }

  test("DPD is non-negative and zero for on-time settlements") {
    assert(out.filter(col("DaysLate") < 0).count() === 0)
    val onTime = out.filter(col("SettledAtCDMX") <= col("DueDate"))
    assert(onTime.filter(col("DaysLate") =!= 0).count() === 0)
  }

  test("cohort: first loan per user is First, later loans Repeat") {
    val firsts = out.groupBy("UserId")
      .agg(min("LoanNumber").as("mn"))
      .filter(col("mn") =!= 1)
    assert(firsts.count() === 0)
    assert(out.filter(col("LoanNumber") === 1 &&
      col("LoanCohort") =!= "First").count() === 0)
  }

  test("entry smoke: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
