package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Money
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream analytics over the `events` table — the batch twins of the
  * streaming surface (graft.streaming): tumbling-window aggregation,
  * gap-based sessionization, and JSON property extraction. The reference
  * has no streaming runtime (SURVEY §2.9); these are the extension ops a
  * training-data pipeline needs, expressed shuffle-consciously (one
  * hash-aggregate per query, windows keyed by the same user_id the
  * sessionizer partitions on).
  */
object EventQueries {
  import Money.{sqlRound, sqlSum}

  private val Gap = 30 * 60 * 1000000L // 30 min session gap, in micros

  /** FLOOR division of an integer SQL expression by a positive constant,
    * via the e01 positive-mod spelling (`x - pmod(x, n)` is the exact
    * floor multiple, so the `div` is exact). Spark's `div` truncates
    * toward zero while the DuckDB oracles' `//` floors — the two
    * disagree on every pre-1970 timestamp, so epoch-bucket derivations
    * (j19's seconds, e14's days) must go through this spelling instead
    * of a bare `div` for the parity to be timestamp-sign-independent.
    */
  private def floorDivSql(x: String, n: Long): String =
    s"(($x - pmod($x, ${n}L)) div ${n}L)"

  /** Shared oracle for the 6 h / 2 h hopping window (e06 batch, st08
    * streaming — the same aggregation by design). Each event belongs to
    * the 3 windows starting at floor_2h(ts) - k*2h, k ∈ 0..2; the floor
    * is the e01 positive-mod spelling so pre-1970 timestamps bucket like
    * Spark's window() (floor), not DuckDB's `//` (trunc toward zero).
    */
  private[operators] val HopUs = 7200000000L
  private[operators] val HopLenUs = 21600000000L
  val HoppingOracle: String = s"""
WITH e AS (
  SELECT epoch_us(ts) AS us, event_type, value FROM events
),
expanded AS (
  SELECT us - ((us % $HopUs + $HopUs) % $HopUs) - k.k * $HopUs AS w_us,
    event_type, value
  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS k) k
)
SELECT CAST(to_timestamp(w_us / 1000000) AS TIMESTAMP) AS window_start,
  CAST(to_timestamp((w_us + $HopLenUs) / 1000000) AS TIMESTAMP)
    AS window_end,
  event_type, count(*) AS n_events, ${sqlSum("value")} AS total_value
FROM expanded GROUP BY 1, 2, 3
ORDER BY window_start, event_type"""

  def defs: Map[String, QueryDef] = Map(

    // ── Tumbling 6-hour windows: batch analog of the Structured Streaming
    // groupBy(window(ts)) aggregation (bucket = epoch div floor).
    "e01_tumbling_window" -> QueryDef(
      (s, d) => Tables.events(s, d)
        // integer arithmetic, not `/`: epoch-micros (~1.7e18) overflow a
        // double. us - pmod(us, W) is exact FLOOR division, matching
        // Spark's own window() on pre-1970 timestamps; `div` and DuckDB's
        // `//` BOTH truncate toward zero, so the oracle spells the same
        // positive-mod floor to bucket negatives identically.
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("window_start",
          expr("CAST(timestamp_micros(us - pmod(us, 21600000000))" +
            " AS timestamp_ntz)"))
        .groupBy(col("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Money.moneySum(col("value")).as("total_value"),
          max(col("value")).as("max_value"))
        .orderBy("window_start", "event_type"),
      Some(s"""SELECT
              CAST(to_timestamp((epoch_us(ts)
                - ((epoch_us(ts) % 21600000000 + 21600000000) % 21600000000))
                / 1000000) AS TIMESTAMP) AS window_start,
              event_type, count(*) AS n_events,
              ${sqlSum("value")} AS total_value,
              max(value) AS max_value
              FROM events GROUP BY 1, 2
              ORDER BY window_start, event_type""")),

    // ── Gap-based sessionization: lag + conditional cumsum — the batch twin
    // of flatMapGroupsWithState session assembly.
    "e02_sessionize" -> QueryDef(
      (s, d) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val sessions = Tables.events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("is_new",
            when(col("prev_ts").isNull ||
              unix_micros(col("ts").cast("timestamp")) -
                unix_micros(col("prev_ts").cast("timestamp")) > Gap, 1L)
              .otherwise(0L))
          .withColumn("session_seq",
            sum(col("is_new")).over(
              byUser.rowsBetween(Window.unboundedPreceding,
                Window.currentRow)))
        sessions.groupBy(col("user_id"), col("session_seq"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"))
          .orderBy("user_id", "session_seq")
      },
      Some(s"""
WITH marked AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts, 1) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > $Gap
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM marked
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
  count(*) AS n_events,
  min(ts) AS session_start, max(ts) AS session_end
FROM sessions GROUP BY 1, 2 ORDER BY user_id, session_seq""")),

    // ── Band (range) join: facts land in value tiers via a non-equi
    // condition. The tier table is tiny and BROADCAST, so the range
    // predicate evaluates map-side against every fact row — no shuffle of
    // the fact side at any scale. (Were the banded dimension large, the
    // scale move is to add a coarse equi-key — e.g. `floor(value / step)`
    // on both sides — turning it into a hash join plus residual filter.)
    "j13_range_band_join" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val tiers = Seq((0d, 50d, "small"), (50d, 200d, "medium"),
          (200d, 1000d, "large")).toDF("lo", "hi", "tier")
        Tables.events(s, d)
          .join(broadcast(tiers),
            col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n_events"),
            Money.moneySum(col("value")).as("total_value"))
          .orderBy("tier")
      },
      Some(s"""
WITH tiers(lo, hi, tier) AS (
  VALUES (0.0, 50.0, 'small'), (50.0, 200.0, 'medium'),
         (200.0, 1000.0, 'large'))
SELECT tier, count(*) AS n_events, ${sqlSum("value")} AS total_value
FROM events JOIN tiers ON value >= lo AND value < hi
GROUP BY 1 ORDER BY tier"""),
      "broadcast band join: non-equi range predicate, zero fact shuffle"),

    // ── As-of join (pandas merge_asof shape): each event picks the most
    // recent order at-or-before its timestamp for the same user. Composed
    // from existing operators — equi-join on the user key (hash join; the
    // fan-out is bounded by orders-per-user) + per-event max(struct)
    // AGGREGATION for the top-1 pick. The aggregation (not a window) is
    // the scale move: partial aggregation collapses each event's fan-out
    // MAP-SIDE, so the post-join shuffle carries one row per event
    // instead of the full event×order fan-out a row_number window would
    // sort and shuffle. struct max is lexicographic (orderdate, then
    // orderkey) = the same deterministic tie-broken pick; an unmatched
    // left row's singleton struct(null, null) survives the agg and
    // unpacks back to nulls — left-join semantics preserved.
    "j14_asof_join" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"))
        val ord = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        ev.join(ord,
            col("user_id") === col("o_custkey") &&
              col("o_orderdate").cast("timestamp_ntz") <= col("ts"), "left")
          .groupBy(col("event_id"), col("user_id"), col("ts"))
          .agg(max(struct(col("o_orderdate"), col("o_orderkey")))
            .as("pick"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("pick.o_orderkey").as("asof_order"),
            col("pick.o_orderdate").as("asof_orderdate"))
          .orderBy("event_id")
      },
      Some("""
SELECT event_id, user_id, ts, asof_order, asof_orderdate FROM (
  SELECT e.event_id, e.user_id, e.ts,
    o.o_orderkey AS asof_order, o.o_orderdate AS asof_orderdate,
    row_number() OVER (PARTITION BY e.event_id
      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e LEFT JOIN orders o
    ON e.user_id = o.o_custkey AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts)
WHERE rn = 1 ORDER BY event_id"""),
      "as-of join composed as equi-join + per-row top-1 window"),

    // ── Forward as-of join: each event picks the user's FIRST order at
    // or after it — "time to next conversion" attribution, the mirror of
    // j14's backward pick with min(struct) instead of max(struct). Same
    // scale argument: the aggregation collapses each event's fan-out
    // map-side, so the post-join shuffle carries one row per event.
    "j18_asof_forward" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"))
        val ord = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        ev.join(ord,
            col("user_id") === col("o_custkey") &&
              col("o_orderdate").cast("timestamp_ntz") >= col("ts"), "left")
          .groupBy(col("event_id"), col("user_id"), col("ts"))
          .agg(min(struct(col("o_orderdate"), col("o_orderkey")))
            .as("pick"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("pick.o_orderkey").as("next_order"),
            col("pick.o_orderdate").as("next_orderdate"))
          .orderBy("event_id")
      },
      Some("""
SELECT event_id, user_id, ts, next_order, next_orderdate FROM (
  SELECT e.event_id, e.user_id, e.ts,
    o.o_orderkey AS next_order, o.o_orderdate AS next_orderdate,
    row_number() OVER (PARTITION BY e.event_id
      ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
  FROM events e LEFT JOIN orders o
    ON e.user_id = o.o_custkey AND CAST(o.o_orderdate AS TIMESTAMP) >= e.ts)
WHERE rn = 1 ORDER BY event_id"""),
      "forward as-of join (first order at/after each event)"),

    // ── Interpolation join: each event estimates the user's order value
    // AT its timestamp by linear interpolation between the bracketing
    // orders (last at-or-before, first strictly-after) — the timeseries
    // enrichment one step past as-of (sensor gap-filling, price curves).
    // ONE user-keyed equi-join + ONE per-event aggregation: both
    // bracket picks are conditional min/max over struct, so the order
    // fan-out collapses map-side (partial aggregation) exactly like j14.
    // Parity: interpolation runs in exact integer space — cents
    // (floor(x*100+0.5)) × epoch SECONDS — with the numerator sign
    // case-split so every `div`/`//` sees positive operands (the engines
    // disagree on negative integer division); products are bounded by
    // 5e7 cents × 1.3e8 s ≈ 6e15, far under BIGINT overflow. Ends clamp
    // (one-sided brackets take that side's value), eventless users NULL.
    "j19_interp_join" -> QueryDef(
      (s, d) => {
        // the declared instantiation of [[Joins.interpJoin]]: timestamps
        // quantize to epoch seconds, money to cents, both BIGINT —
        // the combinator's exactness contract
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"))
          .withColumn("ts_sec",
            expr(floorDivSql("unix_micros(CAST(ts AS TIMESTAMP))",
              1000000L)))
        val ord = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            expr(floorDivSql(
              """unix_micros(CAST(CAST(o_orderdate AS TIMESTAMP_NTZ)
                 AS TIMESTAMP))""", 1000000L)).as("od_sec"),
            expr("CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)")
              .as("cents"))
        Joins.interpJoin(ev, ord, "user_id", "o_custkey",
            "ts_sec", "od_sec", "cents", Seq("o_orderkey"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("prev.o_orderkey").as("prev_order"),
            col("next.o_orderkey").as("next_order"),
            col("interp").as("interp_cents"))
          .orderBy("event_id")
      },
      Some("""
WITH pv AS (
  SELECT event_id, pd, pk, pc FROM (
    SELECT e.event_id, o.o_orderdate AS pd, o.o_orderkey AS pk,
      CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) AS pc,
      row_number() OVER (PARTITION BY e.event_id
        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
    FROM events e JOIN orders o ON e.user_id = o.o_custkey
      AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts)
  WHERE rn = 1),
nx AS (
  SELECT event_id, nd, nk, nc FROM (
    SELECT e.event_id, o.o_orderdate AS nd, o.o_orderkey AS nk,
      CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) AS nc,
      row_number() OVER (PARTITION BY e.event_id
        ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
    FROM events e JOIN orders o ON e.user_id = o.o_custkey
      AND CAST(o.o_orderdate AS TIMESTAMP) > e.ts)
  WHERE rn = 1)
SELECT e.event_id, e.user_id, e.ts,
  pv.pk AS prev_order, nx.nk AS next_order,
  CAST(CASE
    WHEN pv.pc IS NOT NULL AND nx.nc IS NOT NULL THEN
      CASE WHEN nx.nc >= pv.pc
      THEN pv.pc + ((nx.nc - pv.pc)
             * (epoch_us(e.ts) // 1000000
                - epoch_us(CAST(pv.pd AS TIMESTAMP)) // 1000000))
           // (epoch_us(CAST(nx.nd AS TIMESTAMP)) // 1000000
              - epoch_us(CAST(pv.pd AS TIMESTAMP)) // 1000000)
      ELSE pv.pc - ((pv.pc - nx.nc)
             * (epoch_us(e.ts) // 1000000
                - epoch_us(CAST(pv.pd AS TIMESTAMP)) // 1000000))
           // (epoch_us(CAST(nx.nd AS TIMESTAMP)) // 1000000
              - epoch_us(CAST(pv.pd AS TIMESTAMP)) // 1000000)
      END
    WHEN pv.pc IS NOT NULL THEN pv.pc
    ELSE nx.nc END AS BIGINT) AS interp_cents
FROM events e LEFT JOIN pv USING (event_id) LEFT JOIN nx USING (event_id)
ORDER BY event_id"""),
      "linear-interpolation join between bracketing orders, integer-exact"),

    // ── Resample + forward-fill: each user's event history re-expressed
    // on a regular DAILY grid between their first and last active day,
    // with gap days carrying the last observed value forward — the
    // standard timeseries densification (sensor gap-fill, daily feature
    // snapshots) that pandas spells `resample('D').ffill()`. Built from
    // pieces this engine already declares: a per-(user, day) rollup
    // (last value picked by max_by over (ts, event_id) — exact, no
    // arithmetic), a bounded grid explode (span ≤ observed days, never
    // unbounded), and ONE backward as-of join ([[Joins.asOf]]) for the
    // carry. Same-day stats come from the carried struct itself: if the
    // grid day had events, the as-of pick IS that day — no second join.
    "e14_resample_ffill" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("day",
            expr(floorDivSql("unix_micros(CAST(ts AS TIMESTAMP))",
              86400000000L)))
        val daily = ev.groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("n_ev"),
            max_by(col("value"), struct(col("ts"), col("event_id")))
              .as("last_value"))
        val grid = daily.groupBy(col("user_id"))
          .agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
          .select(col("user_id"),
            explode(expr("sequence(dmin, dmax)")).as("g_day"))
        Joins.asOf(grid,
            daily.select(col("user_id"), col("day").as("ev_day"),
              col("n_ev"), col("last_value")),
            "user_id", "user_id", "g_day", "ev_day", Nil, "backward")
          .select(col("user_id"),
            expr("""CAST(date_add(DATE'1970-01-01', CAST(g_day AS INT))
                    AS TIMESTAMP_NTZ)""").as("day"),
            when(col("ev_day") === col("g_day"), col("n_ev"))
              .otherwise(0L).cast("bigint").as("n_events"),
            col("last_value").as("value_ffill"))
          .orderBy("user_id", "day")
      },
      Some("""
WITH ev AS (
  SELECT user_id, ts, event_id, value,
    epoch_us(ts) // 86400000000 AS day
  FROM events
),
daily AS (
  SELECT user_id, day, n_ev, last_value FROM (
    SELECT user_id, day, value AS last_value,
      row_number() OVER (PARTITION BY user_id, day
        ORDER BY ts DESC, event_id DESC) AS rn,
      CAST(count(*) OVER (PARTITION BY user_id, day) AS BIGINT) AS n_ev
    FROM ev)
  WHERE rn = 1
),
b AS (SELECT user_id, min(day) AS dmin, max(day) AS dmax
      FROM daily GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(dmin, dmax)) AS g_day
         FROM b),
ff AS (
  SELECT g.user_id, g.g_day, d.day AS ev_day, d.n_ev, d.last_value,
    row_number() OVER (PARTITION BY g.user_id, g.g_day
      ORDER BY d.day DESC) AS rn
  FROM grid g JOIN daily d
    ON g.user_id = d.user_id AND d.day <= g.g_day
)
SELECT user_id, CAST(DATE '1970-01-01' + CAST(g_day AS INT) AS TIMESTAMP) AS day,
  CAST(CASE WHEN ev_day = g_day THEN n_ev ELSE 0 END AS BIGINT)
    AS n_events,
  last_value AS value_ffill
FROM ff WHERE rn = 1
ORDER BY user_id, day"""),
      "daily resample + forward-fill per user via one backward as-of"),

    // ── Staged funnel: per user, the first signup, the first click AT OR
    // AFTER that signup, and the first purchase at or after that click —
    // ordered-stage conversion, the standard product-analytics ask. Three
    // conditional-min aggregations; each stage's bound comes from the
    // previous stage via a broadcast-joinable (user, ts) frame, so the
    // event table is scanned, never windowed whole. All mins — order-
    // independent and oracle-exact.
    "e04_funnel" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"))
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts")).as("first_signup"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, "user_id")
          .filter(col("ts") >= col("first_signup"))
          .groupBy("user_id").agg(min(col("ts")).as("first_click"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, "user_id")
          .filter(col("ts") >= col("first_click"))
          .groupBy("user_id").agg(min(col("ts")).as("first_purchase"))
        s1.join(s2, Seq("user_id"), "left")
          .join(s3, Seq("user_id"), "left")
          .select(col("user_id"),
            col("first_signup").cast("timestamp_ntz").as("first_signup"),
            col("first_click").cast("timestamp_ntz").as("first_click"),
            col("first_purchase").cast("timestamp_ntz")
              .as("first_purchase"),
            (when(col("first_purchase").isNotNull, 3)
              .when(col("first_click").isNotNull, 2)
              .otherwise(1)).cast("bigint").as("reached_stage"))
          .orderBy("user_id")
      },
      Some("""
WITH s1 AS (
  SELECT user_id, min(ts) AS first_signup FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS first_click
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.first_signup
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS first_purchase
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.first_click
  GROUP BY 1
)
SELECT s1.user_id AS user_id, s1.first_signup, s2.first_click,
  s3.first_purchase,
  CAST(CASE WHEN s3.first_purchase IS NOT NULL THEN 3
            WHEN s2.first_click IS NOT NULL THEN 2
            ELSE 1 END AS BIGINT) AS reached_stage
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
ORDER BY user_id"""),
      "ordered-stage funnel: conditional mins bounded by the prior stage"),

    // ── Binned range join, LARGE × LARGE (the shape j13's broadcast band
    // join can't take): purchases (points) ⋈ click-attribution windows
    // (intervals) for the same user — the batch twin of st07, spelled via
    // [[Joins.rangeJoinBinned]]. Both sides shuffle once on (user,
    // hour-bin); each 1 h interval spans ≤ 2 one-hour bins, so the
    // fan-out is bounded and the residual filter restores the exact
    // interval semantics. Same result set as the st07 stream drain.
    "j15_binned_range_join" -> QueryDef(
      (s, d) => {
        val HourUs = 3600000000L
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"),
            col("user_id").as("c_user"), col("ts").as("click_ts"),
            unix_micros(col("ts").cast("timestamp")).as("lo_us"))
          .withColumn("hi_us", col("lo_us") + HourUs)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("purchase_ts"),
            unix_micros(col("ts").cast("timestamp")).as("t_us"))
        Joins.rangeJoinBinned(purchases, clicks,
            Seq("user_id"), Seq("c_user"),
            "t_us", "lo_us", "hi_us", HourUs)
          .select(col("click_id"), col("purchase_id"), col("user_id"),
            col("click_ts").cast("timestamp_ntz").as("click_ts"),
            col("purchase_ts").cast("timestamp_ntz").as("purchase_ts"))
          .orderBy("click_id", "purchase_id")
      },
      Some("""SELECT c.event_id AS click_id, p.event_id AS purchase_id,
              c.user_id, c.ts AS click_ts, p.ts AS purchase_ts
              FROM events c JOIN events p
                ON c.event_type = 'click' AND p.event_type = 'purchase'
               AND p.user_id = c.user_id
               AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
              ORDER BY click_id, purchase_id"""),
      "binned range join: two big sides, (key, time-bin) equi + residual"),

    // ── Linear multi-touch attribution: each purchase's value is split
    // equally across the clicks in its preceding hour (the j15/st07
    // attribution join, carried to the MONEY step), and each click
    // accumulates its credited revenue. The per-purchase split is one
    // window over the join output (purchase-keyed — bounded by touches
    // per purchase); credits are cent-rounded BEFORE the decimal sum so
    // the totals are exact and order-independent. This is the query a
    // marketing pipeline actually ships on top of the attribution join.
    "e08_attribution" -> QueryDef(
      (s, d) => {
        val HourUs = 3600000000L
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"),
            col("user_id").as("c_user"),
            unix_micros(col("ts").cast("timestamp")).as("lo_us"))
          .withColumn("hi_us", col("lo_us") + HourUs)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("value"),
            unix_micros(col("ts").cast("timestamp")).as("t_us"))
        val byPurchase = Window.partitionBy("purchase_id")
        Joins.rangeJoinBinned(purchases, clicks,
            Seq("user_id"), Seq("c_user"),
            "t_us", "lo_us", "hi_us", HourUs)
          .withColumn("n_touches", count(lit(1)).over(byPurchase))
          .withColumn("credit",
            Money.moneyRound(col("value") / col("n_touches")))
          .groupBy(col("click_id"))
          .agg(countDistinct(col("purchase_id")).as("n_purchases"),
            Money.moneySum(col("credit")).as("credited"))
          .orderBy("click_id")
      },
      Some(s"""
WITH pairs AS (
  SELECT c.event_id AS click_id, p.event_id AS purchase_id, p.value
  FROM events c JOIN events p
    ON c.event_type = 'click' AND p.event_type = 'purchase'
   AND p.user_id = c.user_id
   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
),
split AS (
  SELECT click_id, purchase_id,
    ${Money.sqlRound("value / (count(*) OVER (PARTITION BY purchase_id))")}
      AS credit
  FROM pairs
)
SELECT click_id, count(DISTINCT purchase_id) AS n_purchases,
  ${Money.sqlSum("credit")} AS credited
FROM split GROUP BY 1 ORDER BY click_id"""),
      "linear multi-touch attribution: interval join + equal-split money"),

    // ── Retention cohorts: users grouped by first-seen week, distinct
    // actives per (cohort_week, week_offset) — the standard retention
    // triangle. Shapes: one per-user min (hash agg on user_id), one
    // shuffle join back on user_id (both sides user-keyed, co-
    // partitioned), one distinct-count agg. Week truncation is Monday-
    // based on both engines; both bounds are week-truncated so the day
    // diff is an exact multiple of 7 and the integer division is exact.
    "e05_retention_cohorts" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
        val first = ev.groupBy("user_id")
          .agg(min(col("ts")).as("first_ts"))
        ev.join(first, "user_id")
          .withColumn("cohort_week",
            date_trunc("week", col("first_ts")).cast("timestamp_ntz"))
          .withColumn("week_offset",
            (datediff(date_trunc("week", col("ts")),
              date_trunc("week", col("first_ts"))) / lit(7))
              .cast("bigint"))
          .groupBy(col("cohort_week"), col("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""
WITH first AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1
)
SELECT CAST(date_trunc('week', f.first_ts) AS TIMESTAMP) AS cohort_week,
  CAST(date_diff('day', date_trunc('week', f.first_ts),
    date_trunc('week', e.ts)) // 7 AS BIGINT) AS week_offset,
  count(DISTINCT e.user_id) AS n_users
FROM events e JOIN first f ON e.user_id = f.user_id
GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""),
      "retention triangle: first-seen cohort week x week offset actives"),

    // ── Hopping (sliding) windows: 6-hour windows advancing every 2 hours
    // via Spark's native window(ts, size, slide) — each event lands in
    // exactly size/slide = 3 overlapping windows, expanded MAP-SIDE
    // before the single hash-agg shuffle (fan-out is the fixed window
    // ratio, never data-dependent). The streaming twin is st08 — same
    // aggregation, same oracle: batch/stream unification again.
    "e06_hopping_window" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .withColumn("ts", col("ts").cast("timestamp"))
        .groupBy(window(col("ts"), "6 hours", "2 hours"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Money.moneySum(col("value")).as("total_value"))
        .select(
          col("window.start").cast("timestamp_ntz").as("window_start"),
          col("window.end").cast("timestamp_ntz").as("window_end"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy("window_start", "event_type"),
      Some(HoppingOracle),
      "native sliding windows: bounded map-side fan-out, one shuffle"),

    // ── Rolling actives: DAU and trailing-7-day WAU per day, plus the
    // DAU/WAU stickiness ratio. Exact sliding-window DISTINCT does not
    // decompose incrementally, so the scalable spelling is: collapse to
    // distinct (user, day) FIRST (one dedup shuffle collapses any event
    // volume to at most users × days rows), then explode each user-day
    // into the ≤ 7 window-days it serves — the fan-out is bounded by
    // the window ratio and runs on the collapsed frame, not the raw
    // firehose. DAU rides along as the k = 0 slice of the same
    // aggregation (no second scan).
    "e07_rolling_actives" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
        .distinct()
        .withColumn("k", explode(expr("sequence(0, 6)")))
        .withColumn("window_day",
          col("day") + expr("make_interval(0, 0, 0, k)"))
        .groupBy(col("window_day"))
        .agg(
          countDistinct(when(col("k") === 0, col("user_id"))).as("dau"),
          countDistinct(col("user_id")).as("wau"))
        .withColumn("stickiness",
          col("dau").cast("double") / col("wau").cast("double"))
        .orderBy("window_day"),
      Some("""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events
),
expanded AS (
  SELECT user_id, day, k.k, day + k.k * INTERVAL 1 DAY AS window_day
  FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS k) k
)
SELECT window_day,
  count(DISTINCT CASE WHEN k = 0 THEN user_id END) AS dau,
  count(DISTINCT user_id) AS wau,
  CAST(count(DISTINCT CASE WHEN k = 0 THEN user_id END) AS DOUBLE)
    / CAST(count(DISTINCT user_id) AS DOUBLE) AS stickiness
FROM expanded GROUP BY 1 ORDER BY window_day"""),
      "DAU + trailing-7-day WAU: dedup first, bounded fan-out after"),

    // ── Volume-anomaly detection: daily event counts vs the trailing
    // 7-day average (a data-quality guard a pipeline runs before
    // accepting an ingest day). Day-grain cardinality is bounded
    // (365 rows/year regardless of corpus bytes), so the single global
    // ordered window is a deliberately tiny post-aggregate stage — the
    // heavy lifting is the one day-keyed count aggregation. The ratio is
    // one IEEE division of exact integers: engine-identical.
    "dq02_volume_anomaly" -> QueryDef(
      (s, d) => {
        val w7 = Window.orderBy("day").rowsBetween(-7, -1)
        Tables.events(s, d)
          .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz")
            .as("day"))
          .agg(count(lit(1)).as("n_events"))
          .withColumn("trail_total", sum(col("n_events")).over(w7))
          .withColumn("trail_days", count(lit(1)).over(w7))
          .withColumn("ratio",
            col("n_events").cast("double") *
              col("trail_days").cast("double") /
              col("trail_total").cast("double"))
          .withColumn("is_spike",
            coalesce(col("ratio") > 2.0, lit(false)))
          .select(col("day"), col("n_events"), col("trail_total"),
            col("trail_days"), col("ratio"), col("is_spike"))
          .orderBy("day")
      },
      Some("""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
    count(*) AS n_events
  FROM events GROUP BY 1
),
t AS (
  SELECT day, n_events,
    sum(n_events) OVER w AS trail_total,
    count(*) OVER w AS trail_days
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT day, n_events, trail_total, trail_days,
  CAST(n_events AS DOUBLE) * CAST(trail_days AS DOUBLE)
    / CAST(trail_total AS DOUBLE) AS ratio,
  coalesce(CAST(n_events AS DOUBLE) * CAST(trail_days AS DOUBLE)
    / CAST(trail_total AS DOUBLE) > 2.0, false) AS is_spike
FROM t ORDER BY day"""),
      "daily volume vs trailing-7-day average: ingest-gate anomaly flag"),

    // ── Daily conversion rates: clicks, purchases, and their ratio per
    // day — one conditional-count aggregation on the day key, ratio as
    // a single IEEE division of exact counts (NULL when a day has no
    // clicks, on both engines). The funnel's time-series twin.
    "e09_conversion_rates" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz")
          .as("day"))
        .agg(
          count(when(col("event_type") === "click", 1)).as("n_clicks"),
          count(when(col("event_type") === "purchase", 1))
            .as("n_purchases"))
        .withColumn("conversion",
          when(col("n_clicks") > 0,
            col("n_purchases").cast("double") /
              col("n_clicks").cast("double")))
        .orderBy("day"),
      Some("""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
  CASE WHEN count(CASE WHEN event_type = 'click' THEN 1 END) > 0
    THEN CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
        AS DOUBLE)
      / CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE)
  END AS conversion
FROM events GROUP BY 1 ORDER BY day"""),
      "daily click->purchase conversion: conditional counts, exact ratio"),

    // ── One-pass table profiling: row count, per-column null counts,
    // exact NDVs and min/max in a single aggregation — the stats pass a
    // warehouse runs before trusting a new drop (and what ANALYZE TABLE
    // computes for the optimizer). Multiple exact COUNT(DISTINCT)s
    // compile to ONE shuffle via Catalyst's Expand (k× map-side rows,
    // each partially aggregated) — not k passes over the table; at
    // 100 TB that is the difference between one scan and five. Output
    // is one row, so the reduce side is trivial.
    "dq04_table_profile" -> QueryDef(
      (s, d) => Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_returnflag")).as("ndv_returnflag"),
        countDistinct(col("l_suppkey")).as("ndv_suppkey"),
        countDistinct(col("l_quantity")).as("ndv_quantity"),
        sum(when(col("l_discount").isNull, 1L).otherwise(0L))
          .as("nulls_discount"),
        sum(when(col("l_returnflag").isNull, 1L).otherwise(0L))
          .as("nulls_returnflag"),
        min(col("l_quantity")).as("min_quantity"),
        max(col("l_quantity")).as("max_quantity"),
        min(col("l_shipdate")).as("min_shipdate"),
        max(col("l_shipdate")).as("max_shipdate")),
      Some("""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS ndv_returnflag,
  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS ndv_suppkey,
  CAST(count(DISTINCT l_quantity) AS BIGINT) AS ndv_quantity,
  CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS nulls_discount,
  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS nulls_returnflag,
  min(l_quantity) AS min_quantity, max(l_quantity) AS max_quantity,
  min(l_shipdate) AS min_shipdate, max(l_shipdate) AS max_shipdate
FROM lineitem"""),
      "single-scan column profile: nulls, exact NDVs, ranges via Expand"),

    // ── Event-type transition matrix: P(next event | event) per the
    // user's ordered stream — the Markov-chain features a behavioral
    // model trains on. One lead() window keyed by user (the state never
    // leaves the user partition) and one tiny (|types|² rows) rollup;
    // the probability is a single IEEE division of exact counts, so the
    // matrix is engine-identical.
    "e10_event_transitions" -> QueryDef(
      (s, d) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("to_event", lead(col("event_type"), 1).over(byUser))
          .filter(col("to_event").isNotNull)
          .groupBy(col("event_type").as("from_event"), col("to_event"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p", col("n").cast("double") /
            sum(col("n")).over(Window.partitionBy("from_event"))
              .cast("double"))
          .orderBy("from_event", "to_event")
      },
      Some("""
WITH seq AS (
  SELECT event_type AS from_event,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS to_event
  FROM events
),
c AS (
  SELECT from_event, to_event, count(*) AS n
  FROM seq WHERE to_event IS NOT NULL GROUP BY 1, 2
)
SELECT from_event, to_event, CAST(n AS BIGINT) AS n,
  CAST(n AS DOUBLE)
    / CAST(sum(n) OVER (PARTITION BY from_event) AS DOUBLE) AS p
FROM c ORDER BY from_event, to_event"""),
      "per-user lead() chain -> exact event transition matrix"),

    // ── Variance-gated volume anomaly (dq02's statistical sibling): flag
    // days whose event count deviates > 2σ from the corpus mean WITHOUT
    // ever computing a float stddev — libm sqrt differs across engines,
    // so the 2σ test is algebra instead: (x−μ)² > 4σ² rearranged over
    // the exact integer sums (n, Σx, Σx²) into
    //   (n·x − Σx)²·(n−1) > 4·n·(n·Σx² − (Σx)²),
    // evaluated in DECIMAL(38,0)/HUGEINT so it cannot overflow at any
    // realistic scale. Day-grain aggregation does the heavy lifting;
    // the 1-row moment table broadcasts.
    "e11_volume_zscore" -> QueryDef(
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz")
            .as("day"))
          .agg(count(lit(1)).as("n_events"))
        // sxx widens BEFORE the per-row multiply: n_events² in 64-bit
        // overflows at ~3e9 events/day (and the sum at ~1.6e8/day over
        // a year) — same operand-level rule as `dev` below
        val moments = daily.agg(count(lit(1)).as("n_days"),
          sum(col("n_events")).as("sx"),
          sum(expr("CAST(n_events AS DECIMAL(38,0)) " +
            "* CAST(n_events AS DECIMAL(38,0))")).as("sxx"))
        daily.crossJoin(broadcast(moments))
          .withColumn("mean_events",
            col("sx").cast("double") / col("n_days").cast("double"))
          // every OPERAND casts to wide decimal BEFORE any multiply:
          // sx*sx in BIGINT would overflow at ~3e9 total events (64-bit
          // wraps silently in Spark, errors in DuckDB) — the wide types
          // must wrap the arithmetic, not the already-overflowed result
          .withColumn("dev", expr(
            "CAST(n_days AS DECIMAL(38,0)) * CAST(n_events AS " +
              "DECIMAL(38,0)) - CAST(sx AS DECIMAL(38,0))"))
          .withColumn("is_outlier", expr(
            """dev * dev * CAST(n_days - 1 AS DECIMAL(38,0))
              | > CAST(4 AS DECIMAL(38,0)) * CAST(n_days AS DECIMAL(38,0))
              |   * (CAST(n_days AS DECIMAL(38,0)) * CAST(sxx AS DECIMAL(38,0))
              |      - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)))"""
              .stripMargin.replace('\n', ' ')))
          .select(col("day"), col("n_events"), col("mean_events"),
            col("is_outlier"))
          .orderBy("day")
      },
      Some("""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
    CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(n_events) AS BIGINT) AS sx,
    sum(CAST(n_events AS HUGEINT) * CAST(n_events AS HUGEINT)) AS sxx
  FROM daily
)
SELECT day, n_events,
  CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_events,
  (CAST(n_days AS HUGEINT) * CAST(n_events AS HUGEINT)
     - CAST(sx AS HUGEINT))
    * (CAST(n_days AS HUGEINT) * CAST(n_events AS HUGEINT)
     - CAST(sx AS HUGEINT))
    * CAST(n_days - 1 AS HUGEINT)
  > CAST(4 AS HUGEINT) * CAST(n_days AS HUGEINT)
    * (CAST(n_days AS HUGEINT) * CAST(sxx AS HUGEINT)
       - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)) AS is_outlier
FROM daily CROSS JOIN m ORDER BY day"""),
      "2-sigma day-volume outliers via exact integer moments, no sqrt"),

    // ── Table-freshness audit: latest event time per monitored table vs
    // a fixed as-of instant (a literal, per the no-wall-clock rule F10)
    // — the staleness gate an orchestrator checks before kicking off
    // downstream jobs. Each branch is a scan-local min/max aggregation
    // (parquet footer statistics serve it without reading row groups);
    // the union is 2 rows.
    "dq05_freshness" -> QueryDef(
      (s, d) => {
        val asOf = "TIMESTAMP '1998-12-31 00:00:00'"
        val ev = Tables.events(s, d).agg(
          lit("events").as("table_name"),
          max(col("ts")).as("max_ts"),
          expr(s"CAST(datediff($asOf, max(ts)) AS BIGINT)")
            .as("days_stale"))
        val od = Tables.orders(s, d).agg(
          lit("orders").as("table_name"),
          max(col("o_orderdate")).cast("timestamp_ntz").as("max_ts"),
          expr(s"CAST(datediff($asOf, max(o_orderdate)) AS BIGINT)")
            .as("days_stale"))
        ev.unionAll(od).orderBy("table_name")
      },
      Some("""
SELECT 'events' AS table_name, max(ts) AS max_ts,
  CAST(date_diff('day', CAST(max(ts) AS DATE), DATE '1998-12-31')
    AS BIGINT) AS days_stale
FROM events
UNION ALL
SELECT 'orders' AS table_name, CAST(max(o_orderdate) AS TIMESTAMP)
    AS max_ts,
  CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
    DATE '1998-12-31') AS BIGINT) AS days_stale
FROM orders
ORDER BY table_name"""),
      "staleness gate: per-table max event time vs an as-of literal"),

    // ── Primary-key uniqueness audit: per table, row count vs distinct
    // key count — the first DQ rule any warehouse load runs (the
    // reference trusts its extracts implicitly; a dupe-producing join
    // upstream corrupts every downstream rollup silently). One
    // count+count-distinct aggregation per table, unioned into a
    // 5-row report. The (l_orderkey, l_linenumber) composite is
    // DELIBERATELY violated by this synthetic data — the red row
    // proves the audit fires.
    "dq06_key_uniqueness" -> QueryDef(
      (s, d) => {
        def check(table: String, keyDesc: String,
            df: DataFrame, keys: Seq[String]): DataFrame =
          df.agg(
            lit(table).as("table_name"), lit(keyDesc).as("key_cols"),
            count(lit(1)).as("n_rows"),
            // composite keys count as a STRUCT (non-null even when a
            // field is null) to match DuckDB's row-value DISTINCT;
            // multi-arg countDistinct would drop any-null rows and the
            // engines would disagree on a null-keyed table
            (if (keys.sizeIs == 1) countDistinct(col(keys.head))
             else countDistinct(struct(keys.map(col): _*)))
              .as("n_keys"))
            .withColumn("n_dupes", col("n_rows") - col("n_keys"))
            .withColumn("is_unique", col("n_dupes") === 0L)
        Seq(
          check("orders", "o_orderkey", Tables.orders(s, d),
            Seq("o_orderkey")),
          check("customer", "c_custkey", Tables.customer(s, d),
            Seq("c_custkey")),
          check("supplier", "s_suppkey", Tables.supplier(s, d),
            Seq("s_suppkey")),
          check("documents", "doc_id", Tables.documents(s, d),
            Seq("doc_id")),
          check("lineitem", "l_orderkey+l_linenumber",
            Tables.lineitem(s, d), Seq("l_orderkey", "l_linenumber")))
          .reduce(_ unionAll _)
          .orderBy("table_name")
      },
      Some("""
SELECT 'orders' AS table_name, 'o_orderkey' AS key_cols,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_dupes,
  count(*) = count(DISTINCT o_orderkey) AS is_unique
FROM orders
UNION ALL
SELECT 'customer', 'c_custkey', CAST(count(*) AS BIGINT),
  CAST(count(DISTINCT c_custkey) AS BIGINT),
  CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT),
  count(*) = count(DISTINCT c_custkey)
FROM customer
UNION ALL
SELECT 'supplier', 's_suppkey', CAST(count(*) AS BIGINT),
  CAST(count(DISTINCT s_suppkey) AS BIGINT),
  CAST(count(*) - count(DISTINCT s_suppkey) AS BIGINT),
  count(*) = count(DISTINCT s_suppkey)
FROM supplier
UNION ALL
SELECT 'documents', 'doc_id', CAST(count(*) AS BIGINT),
  CAST(count(DISTINCT doc_id) AS BIGINT),
  CAST(count(*) - count(DISTINCT doc_id) AS BIGINT),
  count(*) = count(DISTINCT doc_id)
FROM documents
UNION ALL
SELECT 'lineitem', 'l_orderkey+l_linenumber', CAST(count(*) AS BIGINT),
  CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
  CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
  count(*) = count(DISTINCT (l_orderkey, l_linenumber))
FROM lineitem
ORDER BY table_name"""),
      "per-table PK uniqueness audit; the composite-key row fires red"),

    // ── RFM segmentation: recency / frequency / monetary quartiles per
    // user against a fixed as-of instant (no wall-clock, rule F10) —
    // the classic lifecycle-marketing cut. One user-keyed aggregation,
    // then three DISTRIBUTED rank passes ([[Ranks.globalRank]]: range
    // exchange + in-partition sort/stamp + bounded offset join) with
    // ntile(4) recovered in closed form from (rank, n) — the per-user
    // table grows with the user count, so the naive partitionless
    // ntile window would funnel it through one task at scale. Every
    // rank ordering carries user_id as the total-order tiebreak, so
    // quartile boundaries are deterministic on both engines (the
    // oracle keeps the literal ntile(4) windows — identical buckets by
    // construction). Monetary sums go through the DECIMAL money path.
    "e12_rfm_segments" -> QueryDef(
      (s, d) => {
        val asOf = "TIMESTAMP '1998-12-31 00:00:00'"
        val u = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(
            expr(s"CAST(datediff($asOf, max(ts)) AS BIGINT)")
              .as("recency_days"),
            count(lit(1)).as("frequency"),
            Money.moneySum(col("value")).as("monetary"))
          .transform(graft.Caches.scoped)
        val n1 = u.agg(count(lit(1)).cast("bigint").as("_n"))
        // Three INDEPENDENT slim rank branches joined back on the unique
        // user_id, not a foldLeft threading each rank through the next
        // pass: the folded spelling serialized three full-width
        // range-exchange+stats chains (each pass range-samples the
        // previous pass's output, so nothing overlapped — 31 jobs end to
        // end, ~1.4 s of un-parallelized residue in the r13 profile).
        // Slim branches rank only (measure, user_id), run as concurrent
        // subtrees of the one action, and re-attach by key (1:1 — ranks
        // are a pure function of the measure and the unique tiebreak, so
        // rows are identical by construction). Guide §2.6 overlap + §2.3
        // narrower exchanges; the joins are user-keyed and broadcast at
        // bench scale.
        val ranked = Seq[(String, Seq[org.apache.spark.sql.Column], String)](
          ("_rr", Seq(col("recency_days"), col("user_id")), "recency_days"),
          ("_fr", Seq(col("frequency").desc, col("user_id")), "frequency"),
          ("_mr", Seq(col("monetary").desc, col("user_id")), "monetary"))
          .foldLeft(u) { case (acc, (rc, keys, measure)) =>
            acc.join(
              Ranks.globalRank(u.select(col(measure), col("user_id")),
                  keys, rc)
                .select(col("user_id"), col(rc)),
              "user_id")
          }
        ranked.crossJoin(broadcast(n1))
          .withColumn("r_q", expr(Ranks.ntile4Sql("_rr", "_n")))
          .withColumn("f_q", expr(Ranks.ntile4Sql("_fr", "_n")))
          .withColumn("m_q", expr(Ranks.ntile4Sql("_mr", "_n")))
          .withColumn("segment",
            concat(col("r_q"), col("f_q"), col("m_q")))
          .drop("_rr", "_fr", "_mr", "_n")
          .orderBy("user_id")
      },
      Some("""
WITH u AS (
  SELECT user_id,
    CAST(date_diff('day', CAST(max(ts) AS DATE), DATE '1998-12-31')
      AS BIGINT) AS recency_days,
    count(*) AS frequency,
    CAST(sum(CAST(floor(value * 100 + 0.5) / 100 AS DECIMAL(18,2)))
      AS DOUBLE) AS monetary
  FROM events GROUP BY 1
)
SELECT user_id, recency_days, CAST(frequency AS BIGINT) AS frequency,
  monetary,
  CAST(ntile(4) OVER (ORDER BY recency_days, user_id) AS BIGINT) AS r_q,
  CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS BIGINT)
    AS f_q,
  CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS BIGINT)
    AS m_q,
  CAST(ntile(4) OVER (ORDER BY recency_days, user_id) AS VARCHAR)
    || CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS VARCHAR)
    || CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS VARCHAR)
    AS segment
FROM u ORDER BY user_id"""),
      "recency/frequency/monetary quartile segments, deterministic ntile"),

    // ── Event-type co-occurrence lift (market-basket over the event
    // stream): for each pair of types, how many users touch BOTH, and
    // the lift n_both·n_users / (n_a·n_b) that says whether they
    // co-occur more than independence predicts. The (user, type) dedup
    // bounds the join input to distinct pairs; the per-user fan-out is
    // |types|² at worst (tiny); the type totals and user count are
    // 1-row/|types|-row broadcasts. Lift operands widen to
    // DECIMAL(38,0)/HUGEINT before multiplying (the a14 rule) and the
    // final value is ONE IEEE division of exact integers.
    "e13_type_cooccurrence" -> QueryDef(
      (s, d) => {
        val fs = Tables.events(s, d)
          .select(col("user_id"), col("event_type")).distinct()
        val totals = fs.groupBy("event_type")
          .agg(count(lit(1)).as("n_type"))
        val users = fs.agg(countDistinct(col("user_id")).as("n_users"))
        fs.as("a").join(fs.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("n_both"))
          .join(broadcast(totals.withColumnRenamed("event_type", "type_a")
            .withColumnRenamed("n_type", "n_a")), "type_a")
          .join(broadcast(totals.withColumnRenamed("event_type", "type_b")
            .withColumnRenamed("n_type", "n_b")), "type_b")
          .crossJoin(broadcast(users))
          .withColumn("lift", expr(
            """CAST(CAST(n_both AS DECIMAL(38,0))
              |  * CAST(n_users AS DECIMAL(38,0)) AS DOUBLE)
              | / CAST(CAST(n_a AS DECIMAL(38,0))
              |  * CAST(n_b AS DECIMAL(38,0)) AS DOUBLE)"""
              .stripMargin.replace('\n', ' ')))
          .select(col("type_a"), col("type_b"), col("n_both"),
            col("n_a"), col("n_b"), col("n_users"), col("lift"))
          .orderBy("type_a", "type_b")
      },
      Some("""
WITH fs AS (SELECT DISTINCT user_id, event_type FROM events),
t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_type
      FROM fs GROUP BY 1),
u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM fs),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
    CAST(count(*) AS BIGINT) AS n_both
  FROM fs a JOIN fs b ON a.user_id = b.user_id
    AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_both,
  ta.n_type AS n_a, tb.n_type AS n_b, u.n_users,
  CAST(CAST(n_both AS HUGEINT) * CAST(u.n_users AS HUGEINT) AS DOUBLE)
    / CAST(CAST(ta.n_type AS HUGEINT) * CAST(tb.n_type AS HUGEINT)
        AS DOUBLE) AS lift
FROM p
JOIN t ta ON p.type_a = ta.event_type
JOIN t tb ON p.type_b = tb.event_type
CROSS JOIN u
ORDER BY type_a, type_b"""),
      "pairwise event-type lift: dedup first, bounded pair fan-out"),

    // ── JSON property extraction (extension of the schema-sniffing JSON
    // reads, `utils/gsheets_utils.py:183-184`).
    "e03_json_props" -> QueryDef(
      // try_cast, not cast: a firehose's props column always contains
      // garbage JSON and non-numeric values somewhere — the lenient
      // NULL-on-malformed contract (the F3 parse philosophy) instead of
      // an ANSI CAST_INVALID_INPUT crash killing the whole scan. Both
      // engines' TRY_CAST yield NULL identically (EdgeEventsSpec drives
      // the degenerate props).
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
            .as("prop_k"),
          expr("try_cast(get_json_object(props, '$.k') AS BIGINT) % 10")
            .as("k_bucket"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
              TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                AS prop_k,
              TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
                AS k_bucket
              FROM events ORDER BY event_id""")))
}
