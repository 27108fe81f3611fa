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
    *
    * Column-name collisions (the common pandas `merge_asof(on=...)`
    * usage, where both sides carry e.g. `user_id`): the right key is
    * joined under an internal alias and only the right copy is dropped,
    * so a shared key name survives exactly once (the left copy). Any
    * OTHER right column whose name already exists on the left comes out
    * suffixed `_right` (mirroring pandas' `_x`/`_y` disambiguation);
    * this includes the right time column when it shares the left time's
    * name.
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val rowId = "__asof_row_id"
    val rkey  = "__asof_rkey"
    val leftCols = left.columns.toSet
    // The right key gets an internal alias (dropped after the join); any
    // other colliding right column gets the public `_right` suffix.
    def publicName(c: String): String =
      if (leftCols(c)) c + "_right" else c
    val renamed = right.columns.foldLeft(right) { (df, c) =>
      if (c == rightKey) df.withColumnRenamed(c, rkey)
      else if (leftCols(c)) df.withColumnRenamed(c, publicName(c))
      else df
    }
    val rtime = if (rightTime == rightKey) rkey else publicName(rightTime)
    val ordering: Seq[Column] = desc(rtime) +: tieBreak.map { c =>
      desc(if (c == rightKey) rkey else publicName(c))
    }
    val w = Window.partitionBy(rowId).orderBy(ordering: _*)
    val tagged = left.withColumn(rowId, monotonically_increasing_id())
    tagged
      .join(renamed,
        tagged(leftKey) === renamed(rkey) &&
          renamed(rtime) <= tagged(leftTime), "left")
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn", rowId, rkey)
  }
}
