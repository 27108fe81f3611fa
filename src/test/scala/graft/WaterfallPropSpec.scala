package graft

import graft.functions.{Money, Waterfall}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generative invariants for the payment waterfall (SURVEY §5.3): for any
  * loan shape — zero-fee, overpaid, underpaid, partial-bucket — allocation
  * must be exhaustive to min(paid, due) within rounding, per-bucket capped,
  * and non-negative. Exercised through the same Column tree production uses.
  */
class WaterfallPropSpec extends SparkSpec {

  private val cents = Gen.chooseNum(0L, 500000L).map(_ / 100.0)

  private case class Loan(principal: Double, fee: Double, lateFee: Double,
      paid: Double)

  private val loans: Gen[Loan] = for {
    principal <- cents
    fee <- Gen.oneOf(Gen.const(0.0), cents.map(_ / 10))
    lateFee <- Gen.oneOf(Gen.const(0.0), cents.map(_ / 20))
    // paid spans underpaid, exact, and overpaid regimes
    factor <- Gen.chooseNum(0, 150).map(_ / 100.0)
  } yield {
    val r = (x: Double) => math.floor(x * 100 + 0.5) / 100
    Loan(r(principal), r(fee), r(lateFee),
      r((principal + fee * 1.16 + lateFee * 1.16) * factor))
  }

  test("waterfall invariants hold for arbitrary loan shapes") {
    import spark.implicits._
    // one generated batch of many rows beats many single-row Spark jobs
    val sample = Gen.listOfN(2000, loans).sample.get
      .map(l => (l.principal, l.fee, l.lateFee, l.paid))
    val df = Waterfall(
      sample.toDF("PrincipalAmount", "Fee", "LateFee", "TotalAmountPaid")
        .withColumn("TaxOnFee", Money.moneyRound(col("Fee") * 0.16d))
        .withColumn("TaxOnLateFee", Money.moneyRound(col("LateFee") * 0.16d))
        .withColumn("TotalAmountDue",
          col("PrincipalAmount") + col("Fee") + col("TaxOnFee") +
            col("LateFee") + col("TaxOnLateFee")))

    val viol = df
      .withColumn("alloc", least(col("TotalAmountPaid"), col("TotalAmountDue")))
      .withColumn("parts",
        col("PrincipalPaid") + col("FeePaid") + col("TaxOnFeePaid") +
          col("LateFeePaid") + col("TaxOnLateFeePaid"))
      .filter(
        col("PrincipalPaid") < 0 || col("FeePaid") < 0 ||
          col("TaxOnFeePaid") < 0 || col("LateFeePaid") < 0 ||
          col("TaxOnLateFeePaid") < 0 ||
          col("PrincipalPaid") > col("PrincipalAmount") + 0.001 ||
          col("FeePaid") > col("Fee") + 0.001 ||
          col("TaxOnFeePaid") > col("TaxOnFee") + 0.011 ||
          col("LateFeePaid") > col("LateFee") + 0.001 ||
          col("TaxOnLateFeePaid") > col("TaxOnLateFee") + 0.011 ||
          abs(col("parts") - col("alloc")) > 0.02 ||
          // priority: principal untouched until both fee buckets cleared
          (col("PrincipalPaid") > 0 &&
            (col("FeePaid") < col("Fee") - 0.001 ||
              col("LateFeePaid") < col("LateFee") - 0.001)))
    val bad = viol.collect()
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("fully paid loans allocate every bucket exactly") {
    import spark.implicits._
    val sample = Gen.listOfN(500, loans).sample.get
      .map { l =>
        val r = (x: Double) => math.floor(x * 100 + 0.5) / 100
        val paid = r(l.principal) + r(l.fee) + r(r(l.fee) * 0.16) +
          r(l.lateFee) + r(r(l.lateFee) * 0.16)
        (l.principal, l.fee, l.lateFee, paid)
      }
    val df = Waterfall(
      sample.toDF("PrincipalAmount", "Fee", "LateFee", "TotalAmountPaid")
        .withColumn("TaxOnFee", Money.moneyRound(col("Fee") * 0.16d))
        .withColumn("TaxOnLateFee", Money.moneyRound(col("LateFee") * 0.16d))
        .withColumn("TotalAmountDue",
          col("PrincipalAmount") + col("Fee") + col("TaxOnFee") +
            col("LateFee") + col("TaxOnLateFee")))
    val viol = df.filter(
      abs(col("PrincipalPaid") - col("PrincipalAmount")) > 0.001 ||
        abs(col("FeePaid") - col("Fee")) > 0.001 ||
        abs(col("LateFeePaid") - col("LateFee")) > 0.001)
    assert(viol.count() == 0)
  }
}
