package graft.operators

import graft.QueryDef

/** Declared queries for the loan-domain pipeline (SURVEY.md §2 rows
  * exercised end-to-end: E1/J7/A1-A4/U1/U2/W1-W3/P12-P15/F9).
  */
object LoanQueries {
  def defs: Map[String, QueryDef] = Map(
    "loan_detail" -> QueryDef(
      (s, d) => LoanDetail.pipeline(s, d),
      Some(LoanDetail.oracle),
      "E1 flagship: scan→filter→pre-agg→5-way left join→waterfall→window→project"))
}
