package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Payment-waterfall apportionment as pure column expressions.
  *
  * Semantics from the reference's row-wise Python UDF
  * (`/root/reference/extract_loan_detail.py:198-234`): allocate
  * `min(paid, due)` across buckets in priority order —
  *   1. late fee + its 16% tax,
  *   2. fee + its 16% tax,
  *   3. principal —
  * where a partially-covered tax bucket backs the net amount out via
  * `/1.16` with 2-dp rounding and assigns the residual to the tax.
  *
  * The reference evaluates this one Python row at a time (`apply(axis=1)`,
  * `extract_loan_detail.py:232-234`) — an interpreted per-row loop. Here it
  * is a closed-form expression tree of least/when/floor arithmetic, so
  * Catalyst folds it into whole-stage codegen: no UDF boundary, no
  * serialization, vectorizable, and it scales with the scan. This is the
  * idiomatic-Spark answer for scalar row logic at 100 TB.
  *
  * Expects columns: TotalAmountPaid, TotalAmountDue, LateFee, TaxOnLateFee,
  * Fee, TaxOnFee, PrincipalAmount. Emits: PrincipalPaid, FeePaid,
  * TaxOnFeePaid, LateFeePaid, TaxOnLateFeePaid.
  */
object Waterfall {
  import Money.moneyRound

  def apply(df: DataFrame): DataFrame = {
    val alloc = least(col("TotalAmountPaid"), col("TotalAmountDue"))
    val lateDue = col("LateFee") + col("TaxOnLateFee")
    val feeDue = col("Fee") + col("TaxOnFee")

    val lateCovered = alloc >= lateDue
    val lateFeePaid = when(lateCovered, col("LateFee"))
      .otherwise(moneyRound(alloc / 1.16d))
    val taxOnLateFeePaid = when(lateCovered, col("TaxOnLateFee"))
      .otherwise(moneyRound(alloc - lateFeePaid))
    val rem1 = when(lateCovered, alloc - lateDue).otherwise(lit(0d))

    val feeCovered = rem1 >= feeDue
    val feePaid = when(feeCovered, col("Fee"))
      .otherwise(moneyRound(rem1 / 1.16d))
    val taxOnFeePaid = when(feeCovered, col("TaxOnFee"))
      .otherwise(moneyRound(rem1 - feePaid))
    val rem2 = when(feeCovered, rem1 - feeDue).otherwise(lit(0d))

    val principalPaid = least(rem2, col("PrincipalAmount"))

    df.withColumns(Map(
      "LateFeePaid" -> lateFeePaid,
      "TaxOnLateFeePaid" -> taxOnLateFeePaid,
      "FeePaid" -> feePaid,
      "TaxOnFeePaid" -> taxOnFeePaid,
      "PrincipalPaid" -> principalPaid))
  }

  /** DuckDB oracle spelling of the same waterfall, as a SELECT-list
    * fragment. `paid/due/late/taxLate/fee/taxFee/principal` are SQL
    * expressions for the input columns. Emits the five *Paid columns.
    * Kept textually in lockstep with the Column tree above.
    */
  def oracleSelectList(
      paid: String, due: String, late: String, taxLate: String,
      fee: String, taxFee: String, principal: String): String = {
    import Money.sqlRound
    val alloc = s"least($paid, $due)"
    val lateDue = s"(($late) + ($taxLate))"
    val lfp = s"CASE WHEN $alloc >= $lateDue THEN ($late) " +
      s"ELSE ${sqlRound(s"$alloc / 1.16")} END"
    val tlfp = s"CASE WHEN $alloc >= $lateDue THEN ($taxLate) " +
      s"ELSE ${sqlRound(s"$alloc - ($lfp)")} END"
    val rem1 = s"(CASE WHEN $alloc >= $lateDue THEN $alloc - $lateDue ELSE 0 END)"
    val feeDue = s"(($fee) + ($taxFee))"
    val fp = s"CASE WHEN $rem1 >= $feeDue THEN ($fee) " +
      s"ELSE ${sqlRound(s"$rem1 / 1.16")} END"
    val tfp = s"CASE WHEN $rem1 >= $feeDue THEN ($taxFee) " +
      s"ELSE ${sqlRound(s"$rem1 - ($fp)")} END"
    val rem2 = s"(CASE WHEN $rem1 >= $feeDue THEN $rem1 - $feeDue ELSE 0 END)"
    val pp = s"least($rem2, $principal)"
    s"""($lfp) AS LateFeePaid,
       |($tlfp) AS TaxOnLateFeePaid,
       |($fp) AS FeePaid,
       |($tfp) AS TaxOnFeePaid,
       |($pp) AS PrincipalPaid""".stripMargin
  }
}
