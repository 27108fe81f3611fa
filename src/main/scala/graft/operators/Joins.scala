package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable join combinators beyond the built-in operators (SURVEY §2.4
  * extension surface). The declared queries j13/j14 are oracle-checked
  * instantiations of these shapes over the test tables.
  */
object Joins {

  /** Generic as-of join with pandas `merge_asof` direction semantics:
    * `backward` (default) picks the single right row with the greatest
    * `rightTime` at-or-before each left row's `leftTime` among rows
    * sharing the key; `forward` the smallest at-or-after; `nearest` the
    * smallest absolute time distance (an exact tie prefers the backward
    * row). Unmatched left rows survive with nulls (left-join semantics).
    *
    * Shape: equi-join on the key (hash join — the fan-out is bounded by
    * right rows per key) followed by a per-left-row `max_by` AGGREGATION
    * for the top-1 pick (Spark ships no native as-of join). The
    * aggregation — not a window — is the scale-critical choice: partial
    * aggregation collapses each left row's fan-out map-side, so the
    * post-join shuffle carries one row per left row where a row_number
    * window would shuffle and sort the full left×right-per-key fan-out.
    * The pick maximizes a (rightTime, tieBreak...) struct —
    * lexicographic, so `tieBreak` columns (right side, descending) make
    * it deterministic when several right rows share the winning time.
    *
    * The aggregation groups on an internal per-row id
    * (`monotonically_increasing_id` — unique within the job), so the
    * left frame needs no key of its own; the id never escapes. Left
    * columns ride through as `first(...)` (exact: every row in a group
    * is the same left row).
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
      tieBreak: Seq[String] = Nil,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
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
    val publicRight = renamed.columns.filterNot(_ == rkey)
    val tagged = left.withColumn(rowId, monotonically_increasing_id())
    if (publicRight.isEmpty) return tagged.drop(rowId)
    // backward: right at-or-before, latest wins (tie: max of tieBreak);
    // forward: right at-or-after, earliest wins (tie: min of tieBreak);
    // nearest: smallest |Δt| wins, an exact-distance tie prefers the
    // BACKWARD row, then min of tieBreak. All three keep the range
    // predicate null-rejecting so matched groups never see a null row.
    val rangeCond: Column = direction match {
      case "backward" => renamed(rtime) <= tagged(leftTime)
      case "forward"  => renamed(rtime) >= tagged(leftTime)
      case _          => renamed(rtime).isNotNull
    }
    val joined = tagged.join(renamed,
      tagged(leftKey) === renamed(rkey) && rangeCond, "left")
    // the pick key: (rightTime, tieBreak...) struct — struct extremum is
    // lexicographic, and an unmatched left row's singleton all-null
    // struct survives the agg and unpacks back to nulls (left-join
    // semantics preserved)
    val tieCols: Seq[Column] = tieBreak.map { c =>
      if (c == rightKey) rkey else publicName(c)
    }.map(col)
    val payload = struct(publicRight.map(col): _*)
    val pick = (direction match {
      case "backward" =>
        max_by(payload, struct(col(rtime) +: tieCols: _*))
      case "forward" =>
        min_by(payload, struct(col(rtime) +: tieCols: _*))
      case _ =>
        // |Δt| via greatest of both signed differences — works for
        // numeric AND timestamp columns (interval arithmetic) alike
        val dist = greatest(col(leftTime) - col(rtime),
          col(rtime) - col(leftTime))
        min_by(payload, struct(dist +: col(rtime) +: tieCols: _*))
    }).as("__asof_pick")
    val leftThrough = left.columns.map(c => first(col(c)).as(c))
    joined.groupBy(col(rowId))
      .agg(leftThrough.head, (leftThrough.tail :+ pick): _*)
      .select(left.columns.map(col) ++
        publicRight.map(c => col("__asof_pick")(c).as(c)): _*)
  }

  /** Linear-interpolation time join (the generic form of the declared
    * `j19_interp_join`): for each left row, estimate the right table's
    * value at the left timestamp by interpolating between the bracketing
    * right rows per key — last at-or-before and first strictly-after,
    * each picked deterministically by (time, tieBreak…).
    *
    * Exactness contract: `leftTimeSec`/`rightTimeSec` are NON-NEGATIVE
    * epoch-second (or any monotone integer) columns and `valueCol` is an
    * integer column (quantize money to cents, readings to micro-units,
    * …) — interpolation then runs in pure BIGINT with the numerator
    * sign-split so truncating division is engine-independent. One-sided
    * brackets clamp to that side's value; keyless left rows stay NULL.
    * Caller owns overflow headroom: |Δvalue·Δt| must stay under 2⁶³.
    *
    * Shape: ONE key equi-join + ONE per-left-row aggregation whose
    * bracket picks are conditional min/max over structs — partial-
    * aggregable, so the right-side fan-out collapses map-side (the as-of
    * combinator's argument, doubled).
    *
    * @return left.* + `prev`/`next` structs (fields `t`, tieBreak…, `v`)
    *         + `interp` (BIGINT)
    */
  def interpJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTimeSec: String, rightTimeSec: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val rowId = "__interp_row_id"
    val tagged = left.withColumn(rowId, monotonically_increasing_id())
    val payload = struct(
      (col(rightTimeSec).as("t") +: tieBreak.map(col)) :+
        col(valueCol).as("v"): _*)
    val proj = right.select(col(rightKey).as("__interp_rkey"),
      col(rightTimeSec).as("__interp_rt"), payload.as("__interp_pay"))
    val joined = tagged.join(proj,
      tagged(leftKey) === proj("__interp_rkey"), "left")
    val leftThrough = left.columns.map(c => first(col(c)).as(c))
    val lt = first(col(leftTimeSec))
    val picks = Seq(
      max(when(col("__interp_rt") <= col(leftTimeSec),
        col("__interp_pay"))).as("prev"),
      min(when(col("__interp_rt") > col(leftTimeSec),
        col("__interp_pay"))).as("next"))
    def seg(hi: String, lo: String) =
      s"(($hi - $lo) * (__interp_lt - prev.t)) div (next.t - prev.t)"
    joined.groupBy(col(rowId))
      .agg(leftThrough.head,
        (leftThrough.tail ++ (lt.as("__interp_lt") +: picks)): _*)
      .withColumn("interp", expr(s"""CAST(CASE
        WHEN prev IS NOT NULL AND next IS NOT NULL THEN
          CASE WHEN next.v >= prev.v
               THEN prev.v + ${seg("next.v", "prev.v")}
               ELSE prev.v - ${seg("prev.v", "next.v")} END
        WHEN prev IS NOT NULL THEN prev.v
        ELSE next.v END AS BIGINT)"""))
      .select(left.columns.map(col) ++
        Seq(col("prev"), col("next"), col("interp")): _*)
  }

  /** Salted equi-join for skewed keys: when one join key holds a large
    * share of the left side, a plain hash join sends that whole key to
    * one reducer. Salting splits each left key across `salt` partitions
    * (deterministic spread via a per-row id) and replicates each RIGHT
    * row once per salt value, so the hot key's work fans out `salt` ways.
    * Results are exactly a plain inner equi-join (spec-pinned).
    *
    * Use when AQE's skew-join splitting isn't available or the skew is
    * in an aggregation-feeding join it can't split; the right side pays
    * a `salt`× replication, so keep it the smaller input.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salt: Int): DataFrame = {
    require(salt >= 2, s"salt must be >= 2, got $salt")
    val sl = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val sr = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    // Pin the SHUFFLE strategy (guide §3.1): salting exists precisely
    // for the case where the join must shuffle and one key would own a
    // reducer — but Spark's size estimator, seeing a small-enough
    // replicated side, happily plans a BROADCAST of the ×salt-exploded
    // dimension (measured on j20: the whole stall was a 1.2M-row
    // exploded-dim broadcast built through a driver collect, ×8 the
    // bytes broadcasting the unsalted dim would cost — and a broadcast
    // join has no skew to spread in the first place). The hint keeps
    // the combinator meaning what it says at every size: a
    // (key, salt)-partitioned shuffled hash join, dim slice as the
    // per-partition build side (bounded by |dim| × salt / partitions).
    sl.join(sr.hint("shuffle_hash"),
        sl(leftKey) === sr(rightKey) && sl("__salt") === sr("__salt"))
      .drop("__salt")
  }

  /** Binned range join for two LARGE sides: points `t` on the left join
    * intervals `[lo, hi]` on the right (plus optional equi keys). The
    * broadcast band join (j13) needs one small side; here BOTH sides
    * shuffle on (keys, time-bin): each interval explodes across the bins
    * it spans — bounded by `ceil(interval / binWidth) + 1`, so sizing the
    * bin near the typical interval length keeps the fan-out ≤ 2 — and
    * each point lands in exactly one bin, so the bin equi-join plus the
    * residual `lo <= t <= hi` filter is exactly the interval join with
    * no duplicates. Bin math is exact integer division (`div`), which
    * equals floor on the non-negative epoch micros this operates on.
    *
    * @param binWidthUs bin width in MICROSECONDS of the epoch-micro
    *   columns `leftTimeUs` / `rightLoUs` / `rightHiUs` (all >= 0)
    */
  def rangeJoinBinned(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTimeUs: String, rightLoUs: String, rightHiUs: String,
      binWidthUs: Long): DataFrame = {
    require(binWidthUs > 0, s"binWidthUs must be positive, got $binWidthUs")
    val pl = left.withColumn("__bin",
      expr(s"$leftTimeUs div $binWidthUs"))
    val pr = right.withColumn("__bin",
      explode(expr(s"sequence($rightLoUs div $binWidthUs, " +
        s"$rightHiUs div $binWidthUs)")))
    val keyCond = leftKeys.zip(rightKeys)
      .map { case (l, r) => pl(l) === pr(r) }
      .foldLeft(pl("__bin") === pr("__bin"))(_ && _)
    pl.join(pr, keyCond &&
        pr(rightLoUs) <= pl(leftTimeUs) && pl(leftTimeUs) <= pr(rightHiUs))
      .drop("__bin")
  }

  /** Bloom-filter semi-join reduction: build a bloom filter over
    * `right`'s join key (one partial-aggregated pass — the sketch merges
    * map-side, so the wire carries one `numBits`-bit filter per
    * partition) and drop `left` rows that cannot join BEFORE the join's
    * shuffle. At 100 TB this is the difference between shuffling the
    * full fact table and shuffling only the ~matching slice: the filter
    * broadcasts (numBits/8 bytes) while the big side stays map-only
    * until it has been pruned. False positives pass through at the
    * configured rate and are removed by the actual join that follows —
    * never false negatives — so composing `bloomPrefilter` with the
    * real join is result-identical to the plain join (j16 pins exactly
    * that, and JoinCombinatorsSpec the superset/subset bounds).
    *
    * Uses Spark's own BloomFilterAggregate/BloomFilterMightContain
    * (the machinery behind its runtime join filtering), surfaced as
    * `bloom_filter_agg` / `might_contain` by [[graft.GraftExtensions]].
    */
  def bloomPrefilter(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      expectedItems: Long, numBits: Long): DataFrame = {
    val s = left.sparkSession
    graft.GraftExtensions.ensureInstalled(s)
    // xxhash64 hashes by PHYSICAL type: an INT 1 and a BIGINT 1 hash
    // differently, so mismatched key types would drop genuinely
    // matching rows — a silent false-negative that breaks the
    // result-identity guarantee. Demand identical types up front.
    val lt = left.schema(leftKey).dataType
    val rt = right.schema(rightKey).dataType
    require(lt == rt,
      s"bloomPrefilter: key types must match exactly (xxhash64 is " +
        s"type-sensitive): $leftKey is ${lt.simpleString}, " +
        s"$rightKey is ${rt.simpleString} — cast one side first")
    // might_contain demands its filter as a constant or SCALAR SUBQUERY
    // (never a joined column), so the build side is attached as a
    // subquery: executed once, its one-row result reused across every
    // partition of the probe side. Views exist only long enough for
    // sql() to resolve the plan; the analyzed tree keeps the real plans.
    val tag = java.util.UUID.randomUUID.toString.replace("-", "")
    val (lv, rv) = (s"bloom_left_$tag", s"bloom_right_$tag")
    left.createOrReplaceTempView(lv)
    right.createOrReplaceTempView(rv)
    try s.sql(
      s"""SELECT * FROM $lv WHERE might_contain(
         |  (SELECT bloom_filter_agg(xxhash64(`$rightKey`),
         |     ${expectedItems}L, ${numBits}L) FROM $rv),
         |  xxhash64(`$leftKey`))""".stripMargin)
    finally {
      s.catalog.dropTempView(lv)
      s.catalog.dropTempView(rv)
    }
  }
}
