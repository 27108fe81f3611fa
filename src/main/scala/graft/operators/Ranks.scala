package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global rank — the scale-safe spelling of
  * `row_number().over(Window.orderBy(...))`.
  *
  * A partitionless window funnels the whole table through ONE task
  * (Spark's own `WindowExec: No Partition Defined` warning); fine on a
  * bounded post-aggregate, a cliff on anything that grows with the
  * data. This helper computes the identical rank with no single-task
  * stage and no second full-data shuffle:
  *
  *   1. `repartitionByRange(keys)` — Spark's sampled range exchange
  *      puts each row in the partition owning its key range, ascending
  *      partition id = ascending key range (the same machinery a global
  *      `orderBy` uses, WITHOUT the downstream single-partition
  *      window), then `sortWithinPartitions(keys)` — embarrassingly
  *      parallel;
  *   2. `monotonically_increasing_id()` stamps each row in pipeline
  *      order; within a partition the ids are CONSECUTIVE from the
  *      partition's base, so `mono - min(mono)` is the 0-based local
  *      rank — cheaper than a `row_number` window partitioned by pid,
  *      which would re-exchange the full table on the pid column;
  *   3. global rank = local rank + the count of rows in lower
  *      partitions. Both per-partition scalars (base id, row count)
  *      come from one ≤ `spark.sql.shuffle.partitions`-row aggregate —
  *      bounded by CLUSTER width, not data size — folded with a
  *      broadcast triangular self-join rather than a window, so no
  *      partitionless WindowExec appears anywhere in the plan
  *      (PlanSpec pins this).
  *
  * The stamped frame is persisted through the query's cache scope: the
  * offsets branch and the output branch must read the SAME pid/mono
  * assignment, and a recompute would re-sample the range bounds. The
  * result is independent of where the sampled bounds land — ranks only
  * depend on the total order, and callers must pass keys that form one
  * (unique tiebreak last — the registry-wide rule).
  */
private[graft] object Ranks {

  /** Append `rankCol` = the 1-based global rank of each row under the
    * total order `keys` (which may mix asc/desc columns).
    */
  def globalRank(df: DataFrame, keys: Seq[Column],
      rankCol: String): DataFrame = {
    val stamped = df.repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("_rk_mono", monotonically_increasing_id())
      .withColumn("_rk_pid", spark_partition_id().cast("long"))
      .transform(graft.Caches.scoped)
    val pstats = stamped.groupBy("_rk_pid")
      .agg(min("_rk_mono").as("_rk_base"), count(lit(1)).as("_rk_pn"))
    // offset(p) = Σ counts of partitions below p; a broadcast triangular
    // join on the ≤ #partitions-row stats table replaces the
    // running-sum window (the right side is provably cluster-width)
    val offsets = pstats.as("a")
      .join(broadcast(pstats.as("b")),
        col("b._rk_pid") < col("a._rk_pid"), "left")
      .groupBy(col("a._rk_pid").as("_rk_pid"),
        col("a._rk_base").as("_rk_base"))
      .agg(coalesce(sum("b._rk_pn"), lit(0L)).as("_rk_off"))
    stamped
      .join(broadcast(offsets), Seq("_rk_pid"))
      .withColumn(rankCol,
        col("_rk_off") + (col("_rk_mono") - col("_rk_base")) + lit(1L))
      .drop("_rk_pid", "_rk_mono", "_rk_base", "_rk_off")
  }

  /** SQL ntile(4) in closed form from a 1-based global rank `r` and the
    * total row count `n` (both BIGINT column names already in scope):
    * with q = n div 4 and rem = n mod 4, the first rem buckets hold
    * q + 1 rows and the rest hold q, so the bucket of rank r is
    * ceil(r / (q+1)) inside the fat prefix and rem + ceil((r - rem·(q+1))
    * / q) past it — exact integer arithmetic, engine-identical to
    * `ntile(4) OVER (ORDER BY keys)`. The CASE guards the q = 0
    * (n < 4) edge: the fat prefix covers every row, so the q division
    * is never evaluated.
    */
  def ntile4Sql(r: String, n: String): String = s"""
    CAST(CASE WHEN $r <= ($n % 4) * ($n DIV 4 + 1)
      THEN ($r + ($n DIV 4)) DIV (($n DIV 4) + 1)
      ELSE ($n % 4) +
        (($r - ($n % 4) * (($n DIV 4) + 1)) + ($n DIV 4) - 1)
          DIV ($n DIV 4)
    END AS BIGINT)"""
}
