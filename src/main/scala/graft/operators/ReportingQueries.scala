package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{Cleaning, DateTimeFns, Money}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reporting-job patterns from `load_accounting_data.py` and the
  * `extract_growth_data.py` composite transform (SURVEY §2.4 J11, §2.8 U4).
  */
object ReportingQueries {
  import Money.{moneySum, sqlSum}

  /** U4 — `transform_facebook_raw` (`extract_growth_data.py:19-76`) as a
    * reusable `DataFrame => DataFrame` combinator: lenient date parse (F2),
    * `clean_numeric` over keyword-matched money columns (U3), summary-row
    * drop via null-presence filter (P9), snake_case renames (P17). Column
    * matching is by name keyword, same as the reference's
    * `if any(k in col for k in money_keywords)` loop.
    */
  def transformAdsRaw(raw: DataFrame): DataFrame = {
    val moneyKeywords = Seq("spent", "cost", "cpc")
    val moneyCols = raw.columns.filter(c =>
      moneyKeywords.exists(c.toLowerCase.contains))
    val cleaned = moneyCols.foldLeft(raw)((df, c) =>
      df.withColumn(c, Cleaning.cleanNumeric(col(c))))
    cleaned
      .withColumn("Day",
        to_date(col("Day"), "MMM d, yyyy").cast("timestamp_ntz"))
      .filter(col("Ad").isNotNull)
      .withColumnsRenamed(Map(
        "Ad" -> "ad_name", "Day" -> "day",
        "Amount Spent (MXN)" -> "amount_spent", "Reach" -> "reach"))
  }

  /** E3 money columns rolled up by issue month (12) and by settled month
    * (7), `load_accounting_data.py:112-127`.
    */
  private val accountingSums = Seq("PrincipalAmount", "Fee", "TaxOnFee",
    "LateFee", "TaxOnLateFee", "TotalAmountDue", "PrincipalPaid", "FeePaid",
    "TaxOnFeePaid", "LateFeePaid", "TaxOnLateFeePaid", "ApportionedAmountPaid")
  private val settledSums = Seq("PrincipalPaid", "FeePaid", "TaxOnFeePaid",
    "LateFeePaid", "TaxOnLateFeePaid", "ApportionedAmountPaid",
    "DisputeAmount")

  /** End of the month before [[LoanDetail.AsOf]] — the reference's
    * `last_day_prev_month` (`load_accounting_data.py:110`), as a literal
    * per the no-wall-clock rule (F10).
    */
  private val LastDayPrevMonth = "2001-12-31 00:00:00"

  def defs: Map[String, QueryDef] = Map(

    // ── E3: the accounting reporting pipeline composed end-to-end
    // (load_accounting_data.py:66-133): loan detail → 34-col projection
    // with month twins → monthly accounting rollup (12 sums, bounded by
    // the as-of literal) ∪ settled-month rollup (7 sums; NULL settled
    // months drop via the <= bound on both engines). Spelled as ONE
    // aggregation pass: each detail row explodes into its qualifying
    // (section, month) tags (≤2) and a single hash agg with map-side
    // combine covers both rollups — no second scan, no persist, no
    // union; per-section column masking happens in the final projection
    // because a (section, month) group only ever holds one section's
    // rows. The shuffle stays rows≈months regardless of input scale.
    "reporting_monthly" -> QueryDef(
      (s, d) => {
        val allSums = (accountingSums ++ settledSums).distinct
        val accOnly = accountingSums.diff(settledSums).toSet
        val setlOnly = settledSums.diff(accountingSums).toSet
        val bound = lit(LastDayPrevMonth).cast("timestamp_ntz")
        val tagged = LoanDetail.detail(s, d)
          .withColumn("IssueMonthCDMX",
            date_trunc("month",
              DateTimeFns.toCdmx(col("IssueDate")).cast("timestamp_ntz")))
          .withColumn("SettledAtMonthCDMX",
            date_trunc("month", col("SettledAtCDMX")))
          .withColumn("ApportionedAmountPaid",
            col("LateFeePaid") + col("TaxOnLateFeePaid") + col("FeePaid") +
              col("TaxOnFeePaid") + col("PrincipalPaid"))
          .withColumn("tag", explode(array(
            when(col("IssueMonthCDMX") < bound,
              struct(lit("accounting_cdmx").as("section"),
                col("IssueMonthCDMX").as("month"))),
            when(col("SettledAtMonthCDMX") <= bound,
              struct(lit("settled_cdmx").as("section"),
                col("SettledAtMonthCDMX").as("month"))))))
          .filter(col("tag").isNotNull)
        tagged
          .groupBy(col("tag.section").as("section"),
            col("tag.month").as("month"))
          .agg(moneySum(col(allSums.head)).as(allSums.head),
            allSums.tail.map(c => moneySum(col(c)).as(c)): _*)
          .select((Seq(col("section"), col("month")) ++ allSums.map {
            case c if accOnly(c) =>
              when(col("section") === "accounting_cdmx", col(c))
                .cast("double").as(c)
            case c if setlOnly(c) =>
              when(col("section") === "settled_cdmx", col(c))
                .cast("double").as(c)
            case c => col(c)
          }): _*)
          .orderBy("section", "month")
      },
      Some {
        val accList = accountingSums
          .map(c => s"${sqlSum(c)} AS $c").mkString(",\n    ")
        val setList = settledSums
          .map(c => s"${sqlSum(c)} AS $c").mkString(",\n    ")
        s"""
WITH detail AS (
${LoanDetail.oracle}
),
proj AS (
  SELECT
    date_trunc('month', ${DateTimeFns.sqlToCdmx("IssueDate")})
      AS IssueMonthCDMX,
    date_trunc('month', SettledAtCDMX) AS SettledAtMonthCDMX,
    PrincipalAmount, Fee, TaxOnFee, LateFee, TaxOnLateFee, TotalAmountDue,
    PrincipalPaid, FeePaid, TaxOnFeePaid, LateFeePaid, TaxOnLateFeePaid,
    LateFeePaid + TaxOnLateFeePaid + FeePaid + TaxOnFeePaid + PrincipalPaid
      AS ApportionedAmountPaid,
    DisputeAmount
  FROM detail
),
acc AS (
  SELECT 'accounting_cdmx' AS section, IssueMonthCDMX AS month,
    $accList
  FROM proj
  WHERE IssueMonthCDMX < TIMESTAMP '$LastDayPrevMonth'
  GROUP BY 1, 2
),
setl AS (
  SELECT 'settled_cdmx' AS section, SettledAtMonthCDMX AS month,
    $setList
  FROM proj
  WHERE SettledAtMonthCDMX <= TIMESTAMP '$LastDayPrevMonth'
  GROUP BY 1, 2
)
SELECT section, month, PrincipalAmount, Fee, TaxOnFee, LateFee, TaxOnLateFee,
  TotalAmountDue, PrincipalPaid, FeePaid, TaxOnFeePaid, LateFeePaid,
  TaxOnLateFeePaid, ApportionedAmountPaid, CAST(NULL AS DOUBLE)
    AS DisputeAmount
FROM acc
UNION ALL
SELECT section, month, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
  CAST(NULL AS DOUBLE), PrincipalPaid, FeePaid, TaxOnFeePaid, LateFeePaid,
  TaxOnLateFeePaid, ApportionedAmountPaid, DisputeAmount
FROM setl
ORDER BY section, month"""
      },
      "E3 composed: loan detail → month twins → accounting ∪ settled rollups"),

    // ── J11: 4-way chained join where a LEFT JOIN is logically re-narrowed
    // to inner by the WHERE on the right side's column — replicated as
    // written (load_accounting_data.py:185-232, note at :225/:230).
    "j11_referral_multiway" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"), "left")
          .where(r("r_name") === "AMERICA" && col("o_orderstatus") === "F")
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_orders"),
            moneySum(col("o_totalprice")).as("total"))
          .orderBy("n_name")
      },
      Some(s"""SELECT n_name, count(*) AS n_orders,
              ${sqlSum("o_totalprice")} AS total
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              LEFT JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'AMERICA' AND o_orderstatus = 'F'
              GROUP BY 1 ORDER BY n_name"""),
      "4-way join; LEFT JOIN re-narrowed by WHERE (as-written replication)"),

    // ── U4: composite raw-ads transform. The raw frame is synthesized from
    // orders (formatted date string, '$1,234.56' money string, nullable ad
    // name), then pushed through [[transformAdsRaw]]; the oracle is the
    // identity projection, so any parse/clean defect breaks parity.
    "u04_composite_transform" -> QueryDef(
      (s, d) => {
        val raw = Tables.orders(s, d).select(
          col("o_orderkey").as("order_id"),
          when(col("o_orderkey") % 10 === 0, lit(null))
            .otherwise(col("o_orderpriority")).as("Ad"),
          date_format(col("o_orderdate"), "MMM d, yyyy").as("Day"),
          concat(lit("$"), format_number(col("o_totalprice"), 2))
            .as("Amount Spent (MXN)"),
          col("o_custkey").as("Reach"))
        transformAdsRaw(raw)
          .select("order_id", "ad_name", "day", "amount_spent", "reach")
          .orderBy("order_id")
      },
      Some("""SELECT o_orderkey AS order_id, o_orderpriority AS ad_name,
              CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day,
              o_totalprice AS amount_spent,
              o_custkey AS reach
              FROM orders WHERE o_orderkey % 10 <> 0
              ORDER BY order_id"""),
      "format→parse roundtrip: clean_numeric + date parse + drop + rename"),

    // ── Supply-side enrichment (TPC-H-shaped 4-way: fact ⋈ two dims ⋈
    // geo): revenue by supplier nation and part brand, dims broadcast.
    "j12_supply_rollup" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val sup = Tables.supplier(s, d)
        val prt = Tables.part(s, d)
        val nat = Tables.nation(s, d)
        li.join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(prt, col("l_partkey") === col("p_partkey"))
          .join(nat, col("s_nationkey") === col("n_nationkey"))
          .filter(col("p_size") >= 25)
          .groupBy(col("n_name"), col("p_brand"))
          .agg(moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount")))
            .as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy("n_name", "p_brand")
      },
      Some(s"""SELECT n_name, p_brand,
              ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
              count(*) AS n_lines
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN part ON l_partkey = p_partkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE p_size >= 25
              GROUP BY 1, 2 ORDER BY n_name, p_brand"""),
      "fact ⋈ supplier ⋈ part ⋈ nation rollup; all dims broadcast"),

    // ── SCD type-2 dimension apply: fold a change set into a dimension
    // snapshot as VERSIONED rows (valid_from / valid_to / is_current) —
    // the warehouse-table pattern the reference's full-rebuild sink
    // (upload_dataframe_to_dwh) cannot express. Changes are synthesized
    // deterministically (first fulfilled order upgrades the segment);
    // each dim row explodes into its 1-2 versions map-side, so the only
    // shuffle is the change-set aggregation — at scale this is one
    // broadcast (or key-partitioned) join against the dimension, never a
    // rewrite of history.
    "o13_scd2_apply" -> QueryDef(
      (s, d) => {
        val chg = Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .groupBy(col("o_custkey"))
          .agg(min(col("o_orderdate")).as("eff_date"))
        Tables.customer(s, d)
          .join(chg, col("c_custkey") === col("o_custkey"), "left")
          .withColumn("v", explode(array(
            struct(col("c_mktsegment").as("segment"),
              to_date(lit("1992-01-01")).as("valid_from"),
              col("eff_date").as("valid_to"),
              col("eff_date").isNull.as("is_current")),
            when(col("eff_date").isNotNull,
              struct(lit("PRIORITY").as("segment"),
                col("eff_date").as("valid_from"),
                lit(null).cast("date").as("valid_to"),
                lit(true).as("is_current"))))))
          .filter(col("v").isNotNull)
          .select(col("c_custkey"), col("v.segment"), col("v.valid_from"),
            col("v.valid_to"), col("v.is_current"))
          .orderBy("c_custkey", "valid_from")
      },
      Some("""
WITH chg AS (
  SELECT o_custkey, min(o_orderdate) AS eff_date
  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
),
base AS (
  SELECT c.c_custkey, c.c_mktsegment, chg.eff_date
  FROM customer c LEFT JOIN chg ON c.c_custkey = chg.o_custkey
)
SELECT c_custkey, segment, valid_from, valid_to, is_current FROM (
  SELECT c_custkey, c_mktsegment AS segment,
    DATE '1992-01-01' AS valid_from, eff_date AS valid_to,
    eff_date IS NULL AS is_current
  FROM base
  UNION ALL
  SELECT c_custkey, 'PRIORITY', eff_date, CAST(NULL AS DATE), true
  FROM base WHERE eff_date IS NOT NULL)
ORDER BY c_custkey, valid_from"""),
      "SCD-2 versioning: change set folded into valid_from/valid_to rows"),

    // ── MERGE apply (CDC upsert/delete batch onto a snapshot): the
    // operation behind `MERGE INTO` — matched rows update, unmatched
    // change rows insert, delete-marked rows drop. The change set is
    // synthesized deterministically from orders (frequent buyers get a
    // balance update, a shifted key range inserts as new rows, near-
    // inactive customers delete). One outer join between snapshot and
    // changes — the scale shape is a key-partitioned (or broadcast, for
    // small batches) join, never a rewrite of unmatched history. The
    // new balance comes from moneySum, already exact 2-dp on both
    // engines, so no re-rounding is needed.
    "o14_merge_apply" -> QueryDef(
      (s, d) => {
        val ord = Tables.orders(s, d)
        val snap = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        val counts = ord.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_ord"),
            moneySum(col("o_totalprice")).as("spend"))
        val updates = counts.filter(col("n_ord") >= 20)
          .select(col("o_custkey").as("k"),
            lit("update").as("op"), col("spend").as("new_bal"))
        val inserts = counts.filter(col("n_ord") >= 25)
          .select((col("o_custkey") + 1000000L).as("k"),
            lit("insert").as("op"), col("spend").as("new_bal"))
        val deletes = counts.filter(col("n_ord") <= 2)
          .select(col("o_custkey").as("k"),
            lit("delete").as("op"), lit(null).cast("double").as("new_bal"))
        val chg = updates.unionByName(inserts).unionByName(deletes)
        snap.join(chg, col("c_custkey") === col("k"), "full_outer")
          .filter(coalesce(col("op"), lit("keep")) =!= "delete")
          .select(
            coalesce(col("c_custkey"), col("k")).as("c_custkey"),
            coalesce(col("c_mktsegment"), lit("NEW")).as("c_mktsegment"),
            when(col("op").isin("update", "insert"), col("new_bal"))
              .otherwise(col("c_acctbal")).as("c_acctbal"),
            coalesce(col("op"), lit("keep")).as("op"))
          .orderBy("c_custkey")
      },
      Some(s"""
WITH counts AS (
  SELECT o_custkey, count(*) AS n_ord,
    ${sqlSum("o_totalprice")} AS spend
  FROM orders GROUP BY 1
),
chg AS (
  SELECT o_custkey AS k, 'update' AS op, spend AS new_bal
  FROM counts WHERE n_ord >= 20
  UNION ALL
  SELECT o_custkey + 1000000, 'insert', spend FROM counts WHERE n_ord >= 25
  UNION ALL
  SELECT o_custkey, 'delete', CAST(NULL AS DOUBLE) FROM counts
  WHERE n_ord <= 2
)
SELECT coalesce(c.c_custkey, chg.k) AS c_custkey,
  coalesce(c.c_mktsegment, 'NEW') AS c_mktsegment,
  CASE WHEN chg.op IN ('update', 'insert') THEN chg.new_bal
       ELSE c.c_acctbal END AS c_acctbal,
  coalesce(chg.op, 'keep') AS op
FROM customer c FULL OUTER JOIN chg ON c.c_custkey = chg.k
WHERE coalesce(chg.op, 'keep') <> 'delete'
ORDER BY c_custkey"""),
      "MERGE-INTO apply: update/insert/delete batch via one outer join"),

    // ── Data-quality constraint check (the reference's acknowledged gap,
    // README.md:183-185): all rules in one aggregation pass.
    "dq01_constraint_check" -> QueryDef(
      (s, d) => graft.functions.Quality.check(Tables.orders(s, d), Seq(
        graft.functions.Quality.notNull("o_orderkey"),
        graft.functions.Quality.unique("o_orderkey"),
        graft.functions.Quality.nonNegative("o_totalprice"),
        graft.functions.Quality.inSet("o_orderstatus",
          Seq("F", "O", "P")))),
      Some("""SELECT rule, violations, violations = 0 AS passed FROM (
              SELECT 'not_null(o_orderkey)' AS rule,
                count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS violations
                FROM orders
              UNION ALL SELECT 'unique(o_orderkey)',
                count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders
              UNION ALL SELECT 'non_negative(o_totalprice)',
                count(CASE WHEN o_totalprice < 0 THEN 1 END) FROM orders
              UNION ALL SELECT 'in_set(o_orderstatus)',
                count(CASE WHEN o_orderstatus NOT IN ('F','O','P')
                                 OR o_orderstatus IS NULL THEN 1 END)
                FROM orders)
              ORDER BY rule"""),
      "constraint rules evaluated in one distributed aggregation pass"),

    // ── Referential-integrity audit — dq01's cross-TABLE sibling: per
    // foreign-key relationship, child rows and orphans (children whose
    // parent key is missing). Each relationship is one left-anti join
    // on its own key — key-partitioned, no row wider than (key), so
    // the audit costs one shuffle per edge of the schema graph at any
    // scale. events.user_id → customer is the deliberately-dirty edge
    // (the synthetic firehose has users outside the customer table),
    // proving the audit actually fires.
    "dq03_referential" -> QueryDef(
      (s, d) => {
        def edge(name: String, child: org.apache.spark.sql.DataFrame,
            ck: String, parent: org.apache.spark.sql.DataFrame,
            pk: String) = {
          val orphans = child.select(col(ck))
            .join(parent.select(col(pk)), col(ck) === col(pk),
              "left_anti")
          child.agg(count(lit(1)).as("n_child"))
            .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
            .select(lit(name).as("relationship"), col("n_child"),
              col("n_orphans"), (col("n_orphans") === 0L).as("ok"))
        }
        edge("lineitem.l_orderkey -> orders",
            Tables.lineitem(s, d), "l_orderkey",
            Tables.orders(s, d), "o_orderkey")
          .unionByName(edge("orders.o_custkey -> customer",
            Tables.orders(s, d), "o_custkey",
            Tables.customer(s, d), "c_custkey"))
          .unionByName(edge("customer.c_nationkey -> nation",
            Tables.customer(s, d), "c_nationkey",
            Tables.nation(s, d), "n_nationkey"))
          .unionByName(edge("events.user_id -> customer",
            Tables.events(s, d), "user_id",
            Tables.customer(s, d), "c_custkey"))
          .orderBy("relationship")
      },
      Some("""
SELECT relationship, n_child, n_orphans, n_orphans = 0 AS ok FROM (
  SELECT 'lineitem.l_orderkey -> orders' AS relationship,
    (SELECT count(*) FROM lineitem) AS n_child,
    (SELECT count(*) FROM lineitem l
     WHERE NOT EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
  UNION ALL
  SELECT 'orders.o_custkey -> customer',
    (SELECT count(*) FROM orders),
    (SELECT count(*) FROM orders r
     WHERE NOT EXISTS (SELECT 1 FROM customer c
                       WHERE c.c_custkey = r.o_custkey))
  UNION ALL
  SELECT 'customer.c_nationkey -> nation',
    (SELECT count(*) FROM customer),
    (SELECT count(*) FROM customer c
     WHERE NOT EXISTS (SELECT 1 FROM nation n
                       WHERE n.n_nationkey = c.c_nationkey))
  UNION ALL
  SELECT 'events.user_id -> customer',
    (SELECT count(*) FROM events),
    (SELECT count(*) FROM events e
     WHERE NOT EXISTS (SELECT 1 FROM customer c
                       WHERE c.c_custkey = e.user_id)))
ORDER BY relationship"""),
      "cross-table FK audit: one anti-join per schema edge"))
}
