package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable join combinators beyond the built-in operators (SURVEY §2.4
  * extension surface). The declared queries j13/j14 are oracle-checked
  * instantiations of these shapes over the test tables.
  */
object Joins {

  /** Generic as-of join, pandas `merge_asof` "backward" semantics: each
    * left row picks the single right row with the greatest `rightTime`
    * at-or-before its `leftTime` among rows sharing the key; unmatched
    * left rows survive with nulls (left-join semantics).
    *
    * Shape: equi-join on the key (hash join — the fan-out is bounded by
    * right rows per key) followed by a per-left-row top-1 window; both
    * stages partition on high-cardinality keys, so the composition is
    * the scalable spelling of the operator (Spark ships no native as-of
    * join). `tieBreak` columns (right side, descending) make the pick
    * deterministic when several right rows share the winning time.
    *
    * The window partitions on an internal per-row id
    * (`monotonically_increasing_id` — unique within the job), so the
    * left frame needs no key of its own; the id never escapes.
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val rowId = "__asof_row_id"
    val ordering: Seq[Column] =
      desc(rightTime) +: tieBreak.map(desc)
    val w = Window.partitionBy(rowId).orderBy(ordering: _*)
    val tagged = left.withColumn(rowId, monotonically_increasing_id())
    tagged
      .join(right,
        tagged(leftKey) === right(rightKey) &&
          right(rightTime) <= tagged(leftTime), "left")
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn", rowId, rightKey)
  }
}
