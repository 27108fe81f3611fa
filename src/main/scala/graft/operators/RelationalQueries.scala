package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{Cleaning, DateTimeFns, Money}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Granular declared queries for SURVEY.md §2.2-2.7: projections, filters,
  * scalar functions, joins, aggregations, windows, sorts and set ops.
  * Each entry cites the reference behavior it re-expresses and carries a
  * DuckDB oracle kept in lockstep with the Spark plan.
  *
  * Determinism rules (see SURVEY §5): no wall-clock, stable ORDER BY on
  * non-null keys (or explicit NULLS FIRST both sides), money through
  * [[Money]], day-diffs via floor-of-millis.
  */
object RelationalQueries {
  import Money.{moneyRound, moneySum, sqlRound, sqlSum}

  private def li(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
  private def ord(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.orders(s, d)

  def defs: Map[String, QueryDef] = Map(

    // ── P1/P7: projection + equality filter (extract_loan_detail.py:16-71,90-131)
    "p01_project_filter" -> QueryDef(
      (s, d) => ord(s, d)
        .filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              WHERE o_orderstatus = 'O' ORDER BY o_orderkey"""),
      "column projection + equality filter, both pushed into the parquet scan"),

    // ── P2/P18: arithmetic expressions + deterministic rounding
    // (extract_loan_detail.py:24, extract_manual_arcus_payments.py:92)
    "p02_arithmetic_round" -> QueryDef(
      (s, d) => li(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        moneyRound(col("l_extendedprice") * (lit(1d) - col("l_discount")) *
          (lit(1d) + col("l_tax"))).as("charge"),
        (col("l_extendedprice") / 100d).as("units"),
        moneyRound(col("l_extendedprice") * 0.16d).as("tax16"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber,
              ${sqlRound("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS charge,
              l_extendedprice / 100 AS units,
              ${sqlRound("l_extendedprice * 0.16")} AS tax16
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ── P3: searched CASE (extract_loan_detail.py:25-26)
    "p03_case_searched" -> QueryDef(
      (s, d) => li(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_returnflag") === "R",
          moneyRound(col("l_extendedprice") * col("l_discount")))
          .otherwise(0d).as("penalty"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber,
              CASE WHEN l_returnflag = 'R'
                   THEN ${sqlRound("l_extendedprice * l_discount")}
                   ELSE 0 END AS penalty
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ── P4: simple-CASE decode tables (extract_loan_detail.py:29-70,
    // extract_arcus_transactions.py:22-37)
    "p04_decode_case" -> QueryDef(
      (s, d) => ord(s, d).select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", "Fulfilled")
          .when(col("o_orderstatus") === "O", "Open")
          .when(col("o_orderstatus") === "P", "Pending")
          .otherwise(null).as("status_name"),
        when(col("o_orderpriority") === "1-URGENT", "Urgent")
          .when(col("o_orderpriority") === "2-HIGH", "High")
          .when(col("o_orderpriority") === "3-MEDIUM", "Medium")
          .when(col("o_orderpriority") === "5-LOW", "Low")
          .otherwise("Unspecified").as("priority_name"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
              CASE WHEN o_orderstatus = 'F' THEN 'Fulfilled'
                   WHEN o_orderstatus = 'O' THEN 'Open'
                   WHEN o_orderstatus = 'P' THEN 'Pending' END AS status_name,
              CASE WHEN o_orderpriority = '1-URGENT' THEN 'Urgent'
                   WHEN o_orderpriority = '2-HIGH' THEN 'High'
                   WHEN o_orderpriority = '3-MEDIUM' THEN 'Medium'
                   WHEN o_orderpriority = '5-LOW' THEN 'Low'
                   ELSE 'Unspecified' END AS priority_name
              FROM orders ORDER BY o_orderkey""")),

    // ── P5/P6: NOT-IN and IN-list filters (extract_loan_detail.py:75-76,
    // extract_collections_strategies.py:35)
    "p05_filter_in_notin" -> QueryDef(
      (s, d) => li(s, d)
        .filter(!col("l_returnflag").isin("A") &&
          col("l_linenumber").isin(1, 2, 3))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
              WHERE l_returnflag NOT IN ('A') AND l_linenumber IN (1,2,3)
              ORDER BY l_orderkey, l_linenumber, l_returnflag""")),

    // ── P8/P10: date-range filters, partition-prunable
    // (extract_arcus_transactions.py:42, load_accounting_data.py:106-157)
    "p08_filter_date_range" -> QueryDef(
      (s, d) => li(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate <  TIMESTAMP '1998-01-01'
              ORDER BY l_orderkey, l_linenumber""")),

    // ── P9: null-presence filter (extract_growth_data.py:51-52)
    "p09_filter_notnull" -> QueryDef(
      (s, d) => li(s, d)
        .filter(nullif(col("l_discount"), lit(0d)).isNotNull)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_discount"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_discount FROM lineitem
              WHERE nullif(l_discount, 0) IS NOT NULL
              ORDER BY l_orderkey, l_linenumber""")),

    // ── P11/J10: left-join-hit indicator (extract_arcus_transactions.py:37-41)
    "p11_null_indicator" -> QueryDef(
      (s, d) => {
        val returned = li(s, d).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("rk")).distinct()
        ord(s, d).join(returned, col("o_orderkey") === col("rk"), "left")
          .select(col("o_orderkey"),
            when(col("rk").isNotNull, 1).otherwise(0).as("has_return"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
              CASE WHEN r.rk IS NOT NULL THEN 1 ELSE 0 END AS has_return
              FROM orders LEFT JOIN
                (SELECT DISTINCT l_orderkey AS rk FROM lineitem
                 WHERE l_returnflag = 'R') r ON o_orderkey = rk
              ORDER BY o_orderkey""")),

    // ── P12: conditional overwrite, np.where (extract_loan_detail.py:191-195)
    "p12_conditional_overwrite" -> QueryDef(
      (s, d) => ord(s, d).select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F" && col("o_totalprice") < 100000d,
          lit(100000d)).otherwise(col("o_totalprice")).as("adj_price"),
        when(col("o_custkey") % 2 === 0, "Even").otherwise("Odd").as("bucket"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
              CASE WHEN o_orderstatus = 'F' AND o_totalprice < 100000
                   THEN 100000.0 ELSE o_totalprice END AS adj_price,
              CASE WHEN o_custkey % 2 = 0 THEN 'Even' ELSE 'Odd' END AS bucket
              FROM orders ORDER BY o_orderkey""")),

    // ── P13: fill nulls after left join (extract_loan_detail.py:162-165,374)
    "p13_fillna_coalesce" -> QueryDef(
      (s, d) => {
        val agg = li(s, d).filter(col("l_returnflag") === "R")
          .groupBy(col("l_orderkey"))
          .agg(moneySum(col("l_extendedprice")).as("returned_amt"),
            max(col("l_shipdate")).as("last_return"))
        ord(s, d).join(agg, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"),
            coalesce(col("returned_amt"), lit(0d)).as("returned_amt"),
            coalesce(col("last_return"),
              lit("1990-01-01 00:00:00").cast("timestamp_ntz"))
              .as("last_return"))
          .orderBy("o_orderkey")
      },
      Some(s"""SELECT o_orderkey,
              coalesce(a.returned_amt, 0) AS returned_amt,
              coalesce(a.last_return, TIMESTAMP '1990-01-01')
                AS last_return
              FROM orders LEFT JOIN
                (SELECT l_orderkey, ${sqlSum("l_extendedprice")} AS returned_amt,
                        max(l_shipdate) AS last_return
                 FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1) a
              ON o_orderkey = a.l_orderkey
              ORDER BY o_orderkey""")),

    // ── P14: clip to bounds (extract_loan_detail.py:294-295)
    "p14_clip" -> QueryDef(
      (s, d) => li(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        least(greatest(col("l_quantity"), lit(10d)), lit(40d))
          .as("clipped_qty"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
              least(greatest(l_quantity, 10), 40) AS clipped_qty
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ── P15: id normalization casts, incl. the int-roundtrip-string idiom
    // (extract_loan_detail.py:297-299, extract_arcus_transactions.py:62-67)
    "p15_cast_idstring" -> QueryDef(
      (s, d) => ord(s, d).select(
        col("o_orderkey"),
        Cleaning.idString(col("o_orderkey")).as("order_id"),
        Cleaning.idString(col("o_custkey")).as("user_id"),
        col("o_totalprice").cast("bigint").cast("string").as("price_trunc"))
        .orderBy("o_orderkey"),
      Some(s"""SELECT o_orderkey,
              ${Cleaning.sqlIdString("o_orderkey")} AS order_id,
              ${Cleaning.sqlIdString("o_custkey")} AS user_id,
              CAST(CAST(trunc(o_totalprice) AS BIGINT) AS VARCHAR)
                AS price_trunc
              FROM orders ORDER BY o_orderkey""")),

    // ── P16/P17: drop + bulk rename (extract_loan_detail.py:377,
    // extract_growth_data.py:54-74)
    "p16_reshape_rename" -> QueryDef(
      (s, d) => ord(s, d)
        .drop("o_orderpriority")
        .withColumnsRenamed(Map(
          "o_orderkey" -> "order_id", "o_custkey" -> "customer_id",
          "o_orderstatus" -> "status", "o_totalprice" -> "total_price",
          "o_orderdate" -> "order_date"))
        .orderBy("order_id"),
      Some("""SELECT o_orderkey AS order_id, o_custkey AS customer_id,
              o_orderstatus AS status, o_totalprice AS total_price,
              o_orderdate AS order_date
              FROM orders ORDER BY order_id""")),

    // ── F1/U3: clean_numeric (extract_growth_data.py:38-49); the dirty
    // string is synthesized with the same printf on both sides.
    "f01_clean_numeric" -> QueryDef(
      (s, d) => ord(s, d).select(
        col("o_orderkey"),
        Cleaning.cleanNumeric(
          concat(lit("$"), regexp_replace(
            format_string("%.2f", col("o_totalprice")),
            "(\\d)(\\d{3}\\.)", "$1,$2")))
          .as("cleaned"),
        Cleaning.cleanNumeric(
          when(col("o_orderstatus") === "P", lit(" "))
            .otherwise(format_string("%.2f", col("o_totalprice"))))
          .as("cleaned_or_null"))
        .orderBy("o_orderkey"),
      Some(s"""SELECT o_orderkey,
              ${Cleaning.sqlCleanNumeric(
                """'$' || regexp_replace(printf('%.2f', o_totalprice), '(\d)(\d{3}\.)', '\1,\2')""")}
                AS cleaned,
              ${Cleaning.sqlCleanNumeric(
                "CASE WHEN o_orderstatus = 'P' THEN ' ' ELSE printf('%.2f', o_totalprice) END")}
                AS cleaned_or_null
              FROM orders ORDER BY o_orderkey""")),

    // ── F2/F3: format-directed and lenient date parsing
    // (extract_growth_data.py:29; errors='coerce' everywhere)
    "f02_parse_date" -> QueryDef(
      (s, d) => ord(s, d).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "MMM d, yyyy").as("pretty"),
        to_date(date_format(col("o_orderdate"), "MMM d, yyyy"),
          "MMM d, yyyy").cast("timestamp_ntz").as("reparsed"),
        try_to_timestamp(
          when(col("o_orderkey") % 3 === 0, lit("not a date"))
            .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")),
          lit("yyyy-MM-dd HH:mm:ss")).as("lenient"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
              strftime(o_orderdate, '%b %-d, %Y') AS pretty,
              CAST(CAST(strptime(strftime(o_orderdate, '%b %-d, %Y'),
                   '%b %-d, %Y') AS DATE) AS TIMESTAMP) AS reparsed,
              try_strptime(
                CASE WHEN o_orderkey % 3 = 0 THEN 'not a date'
                     ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END,
                '%Y-%m-%d %H:%M:%S') AS lenient
              FROM orders ORDER BY o_orderkey""")),

    // ── F4/F5/F14: UTC→CDMX wall-clock twins + DATEPART under tz
    // (extract_loan_detail.py:139-155, load_accounting_data.py:181-191)
    "f04_tz_cdmx" -> QueryDef(
      (s, d) => li(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        DateTimeFns.toCdmx(col("l_shipdate")).cast("timestamp_ntz")
          .as("ship_cdmx"),
        year(DateTimeFns.toCdmx(col("l_shipdate"))).as("ship_year_cdmx"),
        month(DateTimeFns.toCdmx(col("l_shipdate"))).as("ship_month_cdmx"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber, l_shipdate,
              ${DateTimeFns.sqlToCdmx("l_shipdate")} AS ship_cdmx,
              CAST(year(${DateTimeFns.sqlToCdmx("l_shipdate")}) AS INTEGER)
                AS ship_year_cdmx,
              CAST(month(${DateTimeFns.sqlToCdmx("l_shipdate")}) AS INTEGER)
                AS ship_month_cdmx
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ── F6/F7/F12: month/day truncation, month arithmetic
    // (load_accounting_data.py:60-64,110,151-152; create_calendar.py:42-47)
    "f06_date_trunc_arith" -> QueryDef(
      (s, d) => ord(s, d).select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_trunc("day", col("o_orderdate")).as("day_floor"),
        add_months(col("o_orderdate").cast("date"), 2)
          .cast("timestamp_ntz").as("plus2m"),
        last_day(col("o_orderdate").cast("date"))
          .cast("timestamp_ntz").as("month_end"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
              date_trunc('month', o_orderdate) AS month_start,
              date_trunc('day', o_orderdate) AS day_floor,
              CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)
                AS TIMESTAMP) AS plus2m,
              CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)
                AS month_end
              FROM orders ORDER BY o_orderkey""")),

    // ── F8/F9: timestamp+interval, day diffs as pandas `.dt.days`
    // (extract_loan_detail.py:288-292,329,338)
    "f08_interval_daydiff" -> QueryDef(
      (s, d) => li(s, d)
        .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("o_orderdate") + expr("INTERVAL 30 HOURS")).as("grace_at"),
          floor((unix_millis(col("l_shipdate").cast("timestamp")) -
            unix_millis(col("o_orderdate").cast("timestamp"))) /
            lit(86400000d)).as("days_to_ship"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
              o_orderdate + INTERVAL 30 HOUR AS grace_at,
              CAST(floor((epoch_ms(l_shipdate) - epoch_ms(o_orderdate))
                   / 86400000.0) AS BIGINT) AS days_to_ship
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              ORDER BY l_orderkey, l_linenumber""")),

    // ── F11/F13/U5: strftime patterns + weekday + weekend→Friday shift
    // (extract_growth_data.py:103; create_calendar.py:51-71)
    "f11_date_format" -> QueryDef(
      (s, d) => ord(s, d).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy_MM").as("month_tag"),
        date_format(col("o_orderdate"), "M/d/yyyy").as("us_date"),
        date_format(col("o_orderdate"), "EEEE").as("weekday"),
        DateTimeFns.weekendToFriday(col("o_orderdate").cast("date"))
          .cast("timestamp_ntz").as("biz_day"))
        .orderBy("o_orderkey"),
      Some(s"""SELECT o_orderkey,
              strftime(o_orderdate, '%Y_%m') AS month_tag,
              strftime(o_orderdate, '%-m/%-d/%Y') AS us_date,
              strftime(o_orderdate, '%A') AS weekday,
              CAST(${DateTimeFns.sqlWeekendToFriday("CAST(o_orderdate AS DATE)")}
                AS TIMESTAMP) AS biz_day
              FROM orders ORDER BY o_orderkey""")),

    // ── F15/W3: row-wise least/greatest, null-skipping
    // (extract_loan_detail.py:200,227,238)
    "f15_least_greatest" -> QueryDef(
      (s, d) => li(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        least(col("l_quantity"), col("l_discount") * 100d,
          col("l_tax") * 100d).as("least3"),
        greatest(col("l_quantity"), col("l_discount") * 100d,
          col("l_tax") * 100d).as("greatest3"),
        greatest(
          when(col("l_returnflag") === "R", col("l_shipdate")),
          when(col("l_linestatus") === "F", col("l_shipdate")))
          .as("greatest_ts_nullskip"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
              least(l_quantity, l_discount * 100, l_tax * 100) AS least3,
              greatest(l_quantity, l_discount * 100, l_tax * 100)
                AS greatest3,
              greatest(
                CASE WHEN l_returnflag = 'R' THEN l_shipdate END,
                CASE WHEN l_linestatus = 'F' THEN l_shipdate END)
                AS greatest_ts_nullskip
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ── J1/J3: single-key inner join (extract_loan_detail.py:72-73,87-88)
    "j01_inner_join" -> QueryDef(
      (s, d) => ord(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
          col("c_mktsegment"), col("o_totalprice"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, c_custkey, c_name, c_mktsegment,
              o_totalprice
              FROM orders JOIN customer ON o_custkey = c_custkey
              ORDER BY o_orderkey""")),

    // ── J2: left join keeping unmatched (extract_loan_detail.py:74)
    "j02_left_join_agg" -> QueryDef(
      (s, d) => {
        val perCust = ord(s, d).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            moneySum(col("o_totalprice")).as("lifetime_value"))
        Tables.customer(s, d)
          .join(perCust, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_name"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("lifetime_value"), lit(0d)).as("lifetime_value"))
          .orderBy("c_custkey")
      },
      Some(s"""SELECT c_custkey, c_name,
              coalesce(o.n_orders, 0) AS n_orders,
              coalesce(o.lifetime_value, 0) AS lifetime_value
              FROM customer LEFT JOIN
                (SELECT o_custkey, count(*) AS n_orders,
                        ${sqlSum("o_totalprice")} AS lifetime_value
                 FROM orders GROUP BY 1) o ON c_custkey = o.o_custkey
              ORDER BY c_custkey""")),

    // ── J5/J11: chained multiway join; small dims broadcast explicitly
    // (extract_loan_detail.py:114-116, load_accounting_data.py:185-226)
    "j05_multiway_join" -> QueryDef(
      (s, d) => li(s, d)
        .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name"),
      Some(s"""SELECT r_name, n_name,
              ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
              count(*) AS n_items
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // ── J10 variant: semi/anti joins — the Spark-native EXISTS/NOT EXISTS
    "j10_semi_anti" -> QueryDef(
      (s, d) => {
        val returned = li(s, d).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"))
        val semi = ord(s, d).join(returned,
          col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select(col("o_orderkey"), lit("with_return").as("kind"))
        val anti = ord(s, d).join(returned,
          col("o_orderkey") === col("l_orderkey"), "left_anti")
          .select(col("o_orderkey"), lit("no_return").as("kind"))
        semi.unionByName(anti).orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, 'with_return' AS kind FROM orders
              WHERE EXISTS (SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
              UNION ALL
              SELECT o_orderkey, 'no_return' AS kind FROM orders
              WHERE NOT EXISTS (SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
              ORDER BY o_orderkey""")),

    // ── A1/A2/A4: group sum/max per key (extract_loan_detail.py:82-134)
    "a01_group_sum_max" -> QueryDef(
      (s, d) => li(s, d).groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_price"),
          max(col("l_shipdate")).as("last_ship"),
          min(col("l_shipdate")).as("first_ship"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_orderkey"),
      Some(s"""SELECT l_orderkey, sum(l_quantity) AS sum_qty,
              ${sqlSum("l_extendedprice")} AS sum_price,
              max(l_shipdate) AS last_ship, min(l_shipdate) AS first_ship,
              count(*) AS n_lines
              FROM lineitem GROUP BY 1 ORDER BY l_orderkey""")),

    // ── A3: conditional aggregation (extract_loan_detail.py:110-120)
    "a03_conditional_sum" -> QueryDef(
      (s, d) => li(s, d).groupBy(col("l_orderkey"))
        .agg(
          moneySum(when(col("l_linestatus") === "F",
            col("l_extendedprice") * col("l_discount")).otherwise(0d))
            .as("disputed"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("n_returned"))
        .orderBy("l_orderkey"),
      Some(s"""SELECT l_orderkey,
              ${sqlSum("CASE WHEN l_linestatus = 'F' THEN l_extendedprice * l_discount ELSE 0 END")}
                AS disputed,
              CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned
              FROM lineitem GROUP BY 1 ORDER BY l_orderkey""")),

    // ── Skew-safe aggregation (extension; scale pattern). l_returnflag has
    // 3 distinct values over the whole table — a direct groupBy funnels
    // everything through 3 reducer partitions. Salting the key 16 ways
    // makes the first (heavy) aggregation spread across 3×16 partitions;
    // the second pass folds 16 tiny partials per key. Decimal partials are
    // associative, so the two-phase result is exactly the one-phase one.
    // (Spark's partial/map-side agg already mitigates this shape; salting
    // is the explicit fix when map-side reduction isn't enough — high-
    // cardinality payloads, distinct-aggs, or collect_list-like states.)
    "a09_salted_skew_agg" -> QueryDef(
      (s, d) => li(s, d)
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(sum(moneyRound(col("l_extendedprice"))
          .cast(DecimalType(18, 2))).as("partial_price"),
          count(lit(1)).as("partial_n"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("partial_price")).cast("double").as("sum_price"),
          sum(col("partial_n")).as("n_lines"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, ${sqlSum("l_extendedprice")} AS sum_price,
              count(*) AS n_lines
              FROM lineitem GROUP BY 1 ORDER BY l_returnflag""")),

    // ── Skew-salted JOIN (a09's twin for joins): the declared
    // instantiation of the [[Joins.saltedJoin]] combinator — the fact
    // side gets a salt, the dimension side replicates once per salt
    // value, and the join key becomes (key, salt), so one hot orderkey's
    // rows land on 8 reducers instead of one. The declared result is the
    // plain join's rollup and the oracle IS the plain join: salting
    // changes WHERE rows meet, never WHAT matches (any salt assignment
    // yields the identical join result, which is why the combinator's
    // monotonically_increasing_id salt is legal under a hash-compared
    // oracle). At 100 TB this is the manual fallback when AQE's skew
    // split can't see the skew (e.g. pre-aggregated inputs); the
    // replication cost is |dim| × R — the side you salt is the big one.
    "j20_salted_join" -> QueryDef(
      (s, d) => {
        val fact = li(s, d)
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_extendedprice"))
        val dim = ord(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"))
        Joins.saltedJoin(fact, dim, "l_orderkey", "o_orderkey", 8)
          .groupBy(col("o_orderpriority"), col("l_returnflag"))
          .agg(count(lit(1)).as("n_lines"),
            moneySum(col("l_extendedprice")).as("sum_price"))
          .orderBy("o_orderpriority", "l_returnflag")
      },
      Some(s"""SELECT o.o_orderpriority, l.l_returnflag,
              count(*) AS n_lines,
              ${sqlSum("l.l_extendedprice")} AS sum_price
              FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey
              GROUP BY 1, 2 ORDER BY o_orderpriority, l_returnflag"""),
      "deterministically salted join == plain join (hot-key spreading)"),

    // ── A5/A6: monthly money rollup incl. NULL-key group semantics
    // (load_accounting_data.py:112-127)
    "a05_monthly_rollup" -> QueryDef(
      (s, d) => ord(s, d)
        .withColumn("month",
          when(col("o_orderstatus") === "P",
            lit(null).cast("timestamp_ntz"))
            .otherwise(date_trunc("month", col("o_orderdate"))))
        .groupBy(col("month"))
        .agg(moneySum(col("o_totalprice")).as("total"),
          moneySum(col("o_totalprice") * 0.16d).as("tax"),
          count(lit(1)).as("n"))
        .orderBy(col("month").asc_nulls_first),
      Some(s"""SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                   ELSE date_trunc('month', o_orderdate) END AS month,
              ${sqlSum("o_totalprice")} AS total,
              ${sqlSum("o_totalprice * 0.16")} AS tax,
              count(*) AS n
              FROM orders GROUP BY 1 ORDER BY month NULLS FIRST""")),

    // ── A7/O2: count+sum by year/month with ORDER BY
    // (load_accounting_data.py:179-193)
    "a07_yearmonth_rollup" -> QueryDef(
      (s, d) => ord(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("amount"))
        .orderBy("yr", "mo"),
      Some(s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
              CAST(month(o_orderdate) AS INTEGER) AS mo,
              count(*) AS n_orders, ${sqlSum("o_totalprice")} AS amount
              FROM orders GROUP BY 1, 2 ORDER BY yr, mo""")),

    // ── A8: distinct month tags (extract_growth_data.py:103)
    "a08_distinct_months" -> QueryDef(
      (s, d) => ord(s, d)
        .select(date_format(col("o_orderdate"), "yyyy_MM").as("month_tag"))
        .distinct().orderBy("month_tag"),
      Some("""SELECT DISTINCT strftime(o_orderdate, '%Y_%m') AS month_tag
              FROM orders ORDER BY month_tag""")),

    // ── W1 + the full ranking family (extract_loan_detail.py:39)
    "w01_window_ranks" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        ord(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          row_number().over(w).cast("bigint").as("loan_number"),
          rank().over(w).cast("bigint").as("rnk"),
          dense_rank().over(w).cast("bigint").as("drnk"),
          lag(col("o_orderdate"), 1).over(w).as("prev_order_at"),
          lead(col("o_orderdate"), 1).over(w).as("next_order_at"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
              row_number() OVER w AS loan_number,
              rank() OVER w AS rnk,
              dense_rank() OVER w AS drnk,
              lag(o_orderdate, 1) OVER w AS prev_order_at,
              lead(o_orderdate, 1) OVER w AS next_order_at
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey)
              ORDER BY o_orderkey""")),

    // ── W2/O1/O4: top-1-per-group via window dedup
    // (extract_loan_detail.py:348-352)
    "w02_top1_per_group" -> QueryDef(
      (s, d) => {
        // (l_orderkey, l_linenumber) is not unique in the synthetic data,
        // so the sort is made total over every carried column — ties then
        // produce identical output rows on any engine.
        val w = Window.partitionBy("l_orderkey")
          .orderBy(desc("l_shipdate"), desc("l_linenumber"),
            desc("l_extendedprice"))
        li(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
            col("l_extendedprice"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
              FROM (SELECT l_orderkey, l_linenumber, l_shipdate,
                      l_extendedprice,
                      row_number() OVER (PARTITION BY l_orderkey
                        ORDER BY l_shipdate DESC, l_linenumber DESC,
                                 l_extendedprice DESC) AS rn
                    FROM lineitem)
              WHERE rn = 1 ORDER BY l_orderkey""")),

    // ── W4 (extension): frame-spec running aggregate, exact via decimal
    "w04_running_sum" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ord(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          sum(moneyRound(col("o_totalprice")).cast(DecimalType(18, 2)))
            .over(w).cast("double").as("running_total"))
          .orderBy("o_orderkey")
      },
      Some(s"""SELECT o_orderkey, o_custkey,
              CAST(sum(CAST(${sqlRound("o_totalprice")} AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
              FROM orders ORDER BY o_orderkey""")),

    // ── Analytic family (SURVEY §2.6 note: lead/lag unused by the
    // reference, free in Spark): per-customer order deltas.
    "w05_lead_lag" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        ord(s, d).select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          moneyRound(col("o_totalprice") -
            coalesce(lag(col("o_totalprice"), 1).over(w), lit(0d)))
            .as("delta_vs_prev"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some(s"""SELECT o_custkey, o_orderkey, o_totalprice,
              lag(o_totalprice, 1) OVER w AS prev_price,
              lead(o_totalprice, 1) OVER w AS next_price,
              ${sqlRound("o_totalprice - coalesce(lag(o_totalprice, 1) OVER w, 0)")}
                AS delta_vs_prev
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey)
              ORDER BY o_custkey, o_orderkey""")),

    // ── RANGE-frame rolling window: per-user 7-day trailing count and
    // money sum over event time — the time-based sibling of w04's
    // ROWS frame (a RANGE frame bounds by VALUE distance and includes
    // ties, which rows-offset windows can't express). Frame math runs on
    // exact epoch micros; the money sum goes through decimal, so the
    // rolling total is order-independent within the frame. One window
    // shuffle on the (high-cardinality) user key.
    "w06_rolling_range" -> QueryDef(
      (s, d) => {
        val WeekUs = 7L * 86400L * 1000000L
        val w = Window.partitionBy("user_id").orderBy("ts_us")
          .rangeBetween(-WeekUs, 0)
        Tables.events(s, d)
          .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
          .select(col("event_id"), col("user_id"), col("ts"),
            count(lit(1)).over(w).as("n_7d"),
            sum(moneyRound(col("value")).cast(DecimalType(18, 2)))
              .over(w).cast("double").as("amt_7d"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id, ts,
              count(*) OVER w AS n_7d,
              CAST(sum(CAST(${sqlRound("value")} AS DECIMAL(18,2))) OVER w
                AS DOUBLE) AS amt_7d
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
              ORDER BY event_id"""),
      "RANGE-frame trailing window: value-bounded, tie-inclusive"),

    // ── Distribution ranks: ntile / percent_rank / cume_dist per status.
    // The ordering key is made unique (price, then orderkey) so ntile's
    // bucket assignment and percent_rank's rank are deterministic; the
    // rank ratios divide the same integers on both engines, so the
    // doubles are bit-identical. One window shuffle on the status key.
    "w07_distribution_ranks" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        ord(s, d).select(
          col("o_orderkey"), col("o_orderstatus").as("status"),
          col("o_totalprice"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cum_dist"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus AS status, o_totalprice,
              CAST(ntile(4) OVER w AS BIGINT) AS quartile,
              percent_rank() OVER w AS pct_rank,
              cume_dist() OVER w AS cum_dist
              FROM orders
              WINDOW w AS (PARTITION BY o_orderstatus
                           ORDER BY o_totalprice, o_orderkey)
              ORDER BY o_orderkey"""),
      "ntile/percent_rank/cume_dist over a unique ordering"),

    // ── Hierarchical subtotals (SURVEY §2.5 note: rollup/cube absent in
    // the reference, zero custom code in Spark): year → month → grand.
    "a10_rollup_subtotals" -> QueryDef(
      (s, d) => ord(s, d)
        .rollup(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("amount"),
          grouping_id().cast("bigint").as("lvl"))
        .orderBy(col("yr").asc_nulls_first, col("mo").asc_nulls_first,
          col("lvl")),
      Some(s"""SELECT yr, mo, count(*) AS n_orders,
              ${sqlSum("o_totalprice")} AS amount,
              CAST(GROUPING(yr) * 2 + GROUPING(mo) AS BIGINT) AS lvl
              FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                      CAST(month(o_orderdate) AS INTEGER) AS mo,
                      o_totalprice
                    FROM orders)
              GROUP BY ROLLUP (yr, mo)
              ORDER BY yr NULLS FIRST, mo NULLS FIRST, lvl""")),

    // ── GROUPING SETS: two independent one-dimensional rollups (by
    // year, by priority) plus the grand total in ONE pass over orders —
    // the arbitrary-lattice sibling of a10's ROLLUP / a11's CUBE, via
    // Spark 4's Dataset.groupingSets. Spark expands the sets map-side
    // before the single shuffle, so this reads the fact table once
    // where a UNION of three aggregates would read it three times.
    "a12_grouping_sets" -> QueryDef(
      (s, d) => {
        // grouping expressions are pre-projected: groupingSets unifies
        // set members with grouping columns by attribute, so an aliased
        // expression used in both spots would group twice over
        ord(s, d)
          .select(year(col("o_orderdate")).as("yr"),
            col("o_orderpriority").as("pri"), col("o_totalprice"))
          .groupingSets(Seq(Seq(col("yr")), Seq(col("pri")), Seq()),
            col("yr"), col("pri"))
          .agg(count(lit(1)).as("n_orders"),
            moneySum(col("o_totalprice")).as("amount"),
            grouping_id().cast("bigint").as("lvl"))
          .orderBy(col("yr").asc_nulls_first, col("pri").asc_nulls_first,
            col("lvl"))
      },
      Some(s"""SELECT yr, pri, count(*) AS n_orders,
              ${sqlSum("o_totalprice")} AS amount,
              CAST(GROUPING(yr) * 2 + GROUPING(pri) AS BIGINT) AS lvl
              FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                      o_orderpriority AS pri, o_totalprice
                    FROM orders)
              GROUP BY GROUPING SETS ((yr), (pri), ())
              ORDER BY yr NULLS FIRST, pri NULLS FIRST, lvl"""),
      "arbitrary grouping-set lattice in one scan (GROUPING SETS)"),

    // ── Row-set operations (SURVEY §2.7 note: INTERSECT/EXCEPT absent in
    // the reference, built-in here): customers by order-status overlap.
    "o09_intersect_except" -> QueryDef(
      (s, d) => {
        val f = ord(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey"))
        val o = ord(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey"))
        f.intersect(o).withColumn("cohort", lit("both"))
          .unionByName(f.except(o).withColumn("cohort", lit("fulfilled_only")))
          .orderBy("cohort", "o_custkey")
      },
      Some("""SELECT o_custkey, 'both' AS cohort FROM (
                SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
                INTERSECT
                SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
              UNION ALL
              SELECT o_custkey, 'fulfilled_only' AS cohort FROM (
                SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
                EXCEPT
                SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
              ORDER BY cohort, o_custkey""")),

    // ── Top-k (SURVEY §2.7 note: LIMIT absent in the reference): largest
    // orders, ties broken by key for determinism. orderBy.limit(k) plans
    // as TakeOrderedAndProject — a per-partition heap then a k-row merge,
    // never a full sort.
    "o10_topk" -> QueryDef(
      (s, d) => ord(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // ── O5: union-by-name with missing-column null fill
    // (pd.concat alignment, extract_growth_data.py:155-165)
    "o05_union_by_name" -> QueryDef(
      (s, d) => {
        val a = ord(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_totalprice"),
            lit("hist").as("src"))
        val b = ord(s, d).filter(col("o_orderstatus") === "O")
          .select(lit("live").as("src"), col("o_orderkey"))
        a.unionByName(b, allowMissingColumns = true).orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice, 'hist' AS src FROM orders
              WHERE o_orderstatus = 'F'
              UNION ALL BY NAME
              SELECT 'live' AS src, o_orderkey FROM orders
              WHERE o_orderstatus = 'O'
              ORDER BY o_orderkey""")),

    // ── O6: drop-last-row-per-group (totals-row removal,
    // extract_manual_arcus_payments.py:71-72), file order = linenumber
    "o06_drop_totals_row" -> QueryDef(
      (s, d) => {
        // max-based (not row_number) so duplicate (orderkey, linenumber)
        // pairs in the synthetic data stay deterministic: all rows tied at
        // the max ordinal are treated as the totals row and dropped.
        val w = Window.partitionBy("l_orderkey")
        li(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .withColumn("mx", max(col("l_linenumber")).over(w))
          .filter(col("l_linenumber") < col("mx")).drop("mx")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
              FROM (SELECT l_orderkey, l_linenumber, l_quantity,
                      max(l_linenumber) OVER (PARTITION BY l_orderkey) AS mx
                    FROM lineitem)
              WHERE l_linenumber < mx
              ORDER BY l_orderkey, l_linenumber, l_quantity""")),

    // ── O7: anti-diff of refreshed partitions (extract_growth_data.py:158-161)
    "o07_partition_antidiff" -> QueryDef(
      (s, d) => ord(s, d)
        .filter(!date_format(col("o_orderdate"), "yyyy_MM")
          .isin("1995_01", "1995_02", "1996_06"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy_MM").as("month_tag"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y_%m') AS month_tag
              FROM orders
              WHERE strftime(o_orderdate, '%Y_%m')
                NOT IN ('1995_01','1995_02','1996_06')
              ORDER BY o_orderkey""")),

    // ── W8: gaps-and-islands — each user's longest run of CONSECUTIVE
    // active days (the classic streak/tenure ask). The island key is
    // day-ordinal minus row_number (constant within a consecutive run,
    // jumps at each gap) — one user-keyed window plus two user-keyed
    // aggregations, all sharing the same partitioning, so the chain is
    // one shuffle end-to-end at any scale. Dedup to (user, day) first,
    // as e07: the firehose collapses before any window sees it.
    "w08_streaks" -> QueryDef(
      (s, d) => {
        val ud = Tables.events(s, d)
          .select(col("user_id"),
            date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
          .distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        val islands = ud
          .withColumn("dayn",
            datediff(col("day"), lit("1970-01-01").cast("date"))
              .cast("bigint"))
          .withColumn("grp", col("dayn") - row_number().over(w))
          .groupBy(col("user_id"), col("grp"))
          .agg(min(col("day")).as("streak_start"),
            count(lit(1)).as("streak_len"))
        val top = Window.partitionBy("user_id")
          .orderBy(desc("streak_len"), col("streak_start"))
        islands.withColumn("rn", row_number().over(top))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("streak_start"), col("streak_len"))
          .orderBy("user_id")
      },
      Some("""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events
),
i AS (
  SELECT user_id, day,
    date_diff('day', DATE '1970-01-01', day)
      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM ud
),
st AS (
  SELECT user_id, min(day) AS streak_start, count(*) AS streak_len
  FROM i GROUP BY user_id, grp
)
SELECT user_id, streak_start, streak_len FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
    ORDER BY streak_len DESC, streak_start) AS rn FROM st)
WHERE rn = 1 ORDER BY user_id"""),
      "gaps-and-islands: longest consecutive-day streak, one shuffle"),

    // ── O19: row-hash reconciliation audit — an order-independent
    // content checksum per status group (count + modular sum of
    // per-row md5s), the primitive two systems exchange to prove
    // table equality WITHOUT moving rows (warehouse vs source, pre-
    // vs post-migration). Money enters the hash as exact CENTS, never
    // a rendered double (double→string formatting differs between
    // engines); the modular sum keeps every partial in bigint range,
    // so the map-side combine is exact at any row count. One scan,
    // one tiny aggregation.
    "o19_row_hash_audit" -> QueryDef(
      (s, d) => ord(s, d)
        .withColumn("row_h", expr(
          """pmod(CAST(conv(substr(md5(CAST(concat_ws('|',
             CAST(o_orderkey AS STRING), o_orderstatus,
             CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
               AS STRING)) AS BINARY)), 1, 15), 16, 10) AS BIGINT),
             1000000007)"""))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("row_h")).as("checksum"))
        .orderBy("o_orderstatus"),
      Some("""
SELECT o_orderstatus, count(*) AS n_rows,
  CAST(sum(CAST(('0x' || substr(md5(
    CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|'
      || CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
           AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007) AS BIGINT)
    AS checksum
FROM orders GROUP BY 1 ORDER BY o_orderstatus"""),
      "order-independent table checksum: prove equality without moving rows"),

    // ── W9: share-of-total window — each customer's revenue as a share
    // of their nation's total. The denominator is a windowed DECIMAL
    // sum cast to double (a double window-sum would be fold-order-
    // dependent and drift from the oracle; the decimal is exact and
    // associative — same rule as Money.moneySum, applied to a window
    // frame). The share itself is then one IEEE division of two exact
    // cent values. Both the aggregation and the window shuffle on the
    // same nation key.
    "w09_revenue_share" -> QueryDef(
      (s, d) => {
        val byNation = Window.partitionBy("n_name")
        Tables.orders(s, d)
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .join(Tables.nation(s, d),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("c_custkey"))
          .agg(moneySum(col("o_totalprice")).as("revenue"))
          .withColumn("nation_total",
            sum(col("revenue").cast(DecimalType(18, 2))).over(byNation)
              .cast("double"))
          .withColumn("share", col("revenue") / col("nation_total"))
          .orderBy("n_name", "c_custkey")
      },
      Some(s"""
WITH cust AS (
  SELECT n_name, c_custkey, ${sqlSum("o_totalprice")} AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, c_custkey, revenue,
  CAST(sum(CAST(revenue AS DECIMAL(18,2))) OVER (PARTITION BY n_name)
    AS DOUBLE) AS nation_total,
  revenue / CAST(sum(CAST(revenue AS DECIMAL(18,2)))
    OVER (PARTITION BY n_name) AS DOUBLE) AS share
FROM cust ORDER BY n_name, c_custkey"""),
      "share-of-total: windowed decimal denominator, exact at any order"),

    // ── A14: exact covariance — corr()/covar_samp() aggregate floats
    // incrementally, so their result depends on partition merge order
    // and differs run-to-run AND engine-to-engine. The parity spelling
    // scales both variables to integer cents (the e11 trick, pairwise):
    // cov = (n·Σxy − Σx·Σy) / (n(n−1)), with every operand cast to
    // DECIMAL(38,0)/HUGEINT BEFORE multiplying, the sums exact
    // integers, and ONE double division (plus the 10⁴ cents² descale)
    // at the end. One partial-aggregated pass per group.
    "a14_exact_covariance" -> QueryDef(
      (s, d) => li(s, d)
        .withColumn("xc", expr(
          "CAST(floor(l_quantity * 100 + 0.5d) AS BIGINT)"))
        .withColumn("yc", expr(
          "CAST(floor(l_extendedprice * 100 + 0.5d) AS BIGINT)"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("xc")).as("sx"),
          sum(col("yc")).as("sy"),
          sum(expr("CAST(xc AS DECIMAL(38,0)) * CAST(yc AS DECIMAL(38,0))"))
            .as("sxy"))
        .withColumn("cov_qty_price", expr(
          """CAST(CAST(n AS DECIMAL(38,0)) * sxy
            |  - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))
            |  AS DOUBLE)
            | / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) * 10000.0d)"""
            .stripMargin.replace('\n', ' ')))
        .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
          col("sxy").cast("string").as("sxy"), col("cov_qty_price"))
        .orderBy("l_returnflag"),
      Some("""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(xc) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
  CAST(sum(CAST(xc AS HUGEINT) * CAST(yc AS HUGEINT)) AS VARCHAR)
    AS sxy,
  CAST(CAST(count(*) AS HUGEINT)
         * sum(CAST(xc AS HUGEINT) * CAST(yc AS HUGEINT))
       - CAST(sum(xc) AS HUGEINT) * CAST(sum(yc) AS HUGEINT) AS DOUBLE)
    / (CAST(count(*) AS DOUBLE) * CAST(count(*) - 1 AS DOUBLE)
       * 10000.0) AS cov_qty_price
FROM (SELECT l_returnflag,
        CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS xc,
        CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS yc
      FROM lineitem)
GROUP BY l_returnflag ORDER BY l_returnflag"""),
      "order-independent exact covariance via integer moments"),

    // ── A13: exact per-group order statistics — the p50/p90/p99 VALUE
    // (not bucket) of quantity per return flag: row_number against the
    // group count picks the ceil(p·n)-th value, a deterministic
    // discrete percentile with a unique tie-break. The per-group
    // total-order window is the honest cost of EXACT percentiles; at
    // 100 TB the same report comes from a mergeable quantile sketch
    // (the x21 KMV pattern) at bounded state — this query pins the
    // exact semantics the sketch approximates.
    "a13_group_percentiles" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("l_returnflag")
          .orderBy("l_quantity", "l_orderkey", "l_linenumber")
        val g = Window.partitionBy("l_returnflag")
        def pick(p: Double) = max(when(
          col("rn") === ceil(col("n") * p).cast("long"),
          col("l_quantity")))
        li(s, d)
          .select(col("l_returnflag"), col("l_quantity"),
            col("l_orderkey"), col("l_linenumber"))
          .withColumn("rn", row_number().over(w).cast("bigint"))
          .withColumn("n", count(lit(1)).over(g))
          .groupBy(col("l_returnflag"))
          .agg(max(col("n")).as("n_rows"), pick(0.5).as("p50"),
            pick(0.9).as("p90"), pick(0.99).as("p99"))
          .orderBy("l_returnflag")
      },
      Some("""
WITH r AS (
  SELECT l_returnflag, l_quantity,
    row_number() OVER (PARTITION BY l_returnflag
      ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
    count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag, max(n) AS n_rows,
  max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
    THEN l_quantity END) AS p50,
  max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
    THEN l_quantity END) AS p90,
  max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT)
    THEN l_quantity END) AS p99
FROM r GROUP BY 1 ORDER BY l_returnflag"""),
      "exact discrete percentiles per group (the sketch's ground truth)"),

    // ── O17: snapshot diff — reconcile two versions of a table into
    // added / removed / changed rows (the audit a daily-rebuild
    // pipeline like the reference's runs to see what a rebuild DID).
    // Both versions are derived deterministically from `orders` so the
    // oracle replays them; the diff itself is one full-outer join on
    // the key with null-safe change classification — at any scale one
    // key-partitioned shuffle per side.
    "o17_snapshot_diff" -> QueryDef(
      (s, d) => {
        val base = ord(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
        // old snapshot: rows with key % 10 == 3 don't exist yet
        val prev = base.filter(col("o_orderkey") % 10 =!= 3)
          .select(col("o_orderkey").as("k_old"),
            col("o_orderstatus").as("status_old"))
        // new snapshot: key % 11 == 0 deleted, key % 7 == 0 re-marked
        val next = base.filter(col("o_orderkey") % 11 =!= 0)
          .select(col("o_orderkey").as("k_new"),
            when(col("o_orderkey") % 7 === 0, lit("X"))
              .otherwise(col("o_orderstatus")).as("status_new"))
        prev.join(next, col("k_old") === col("k_new"), "full_outer")
          .withColumn("change_type",
            when(col("k_old").isNull, "added")
              .when(col("k_new").isNull, "removed")
              .when(!(col("status_old") <=> col("status_new")), "changed")
              .otherwise("same"))
          .filter(col("change_type") =!= "same")
          .select(coalesce(col("k_old"), col("k_new")).as("o_orderkey"),
            col("change_type"), col("status_old"), col("status_new"))
          .orderBy("o_orderkey")
      },
      Some("""
WITH prev AS (
  SELECT o_orderkey AS k_old, o_orderstatus AS status_old
  FROM orders WHERE o_orderkey % 10 != 3
),
next AS (
  SELECT o_orderkey AS k_new,
    CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
      AS status_new
  FROM orders WHERE o_orderkey % 11 != 0
)
SELECT coalesce(k_old, k_new) AS o_orderkey,
  CASE WHEN k_old IS NULL THEN 'added'
       WHEN k_new IS NULL THEN 'removed'
       WHEN status_old IS DISTINCT FROM status_new THEN 'changed'
       ELSE 'same' END AS change_type,
  status_old, status_new
FROM prev FULL OUTER JOIN next ON k_old = k_new
WHERE (CASE WHEN k_old IS NULL THEN 'added'
       WHEN k_new IS NULL THEN 'removed'
       WHEN status_old IS DISTINCT FROM status_new THEN 'changed'
       ELSE 'same' END) != 'same'
ORDER BY o_orderkey"""),
      "snapshot reconciliation: added/removed/changed via full-outer join"),

    // ── Incremental view maintenance: a per-customer aggregate view is
    // refreshed by MERGING a delta batch's partial aggregate states into
    // the base snapshot's — count adds, money merges as exact
    // DECIMAL(18,2) partial sums, the recency column takes a null-safe
    // greatest — and the merged view equals the full recompute (the
    // oracle IS the full recompute). This is the warehouse pattern that
    // replaces the reference's nightly full rebuilds
    // (cron_jobs/run_etl.sh): at 100 TB the refresh cost is
    // delta-scan + state-sized merge, never a history rescan; every
    // aggregate here is chosen mergeable (count/sum/max monoids), which
    // is exactly the property that makes the pattern legal.
    "o21_ivm_merge" -> QueryDef(
      (s, d) => {
        def state(df: DataFrame): DataFrame = df
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"),
            sum(moneyRound(col("o_totalprice")).cast(DecimalType(18, 2)))
              .as("amt"),
            max(col("o_orderdate").cast("timestamp_ntz")).as("last"))
        // base snapshot vs the arriving delta batch (key % 10 == 0)
        val base = state(ord(s, d).filter(pmod(col("o_orderkey"), lit(10))
          =!= 0))
        val delta = state(ord(s, d).filter(pmod(col("o_orderkey"), lit(10))
          === 0))
        base.as("b").join(delta.as("dl"), Seq("o_custkey"), "full_outer")
          .select(col("o_custkey"),
            (coalesce(col("b.n"), lit(0L)) + coalesce(col("dl.n"), lit(0L)))
              .as("n_orders"),
            (coalesce(col("b.amt"), lit(0).cast(DecimalType(18, 2)))
              + coalesce(col("dl.amt"), lit(0).cast(DecimalType(18, 2))))
              .cast("double").as("amount"),
            // null-safe max across the two states
            greatest(coalesce(col("b.last"), col("dl.last")),
              coalesce(col("dl.last"), col("b.last"))).as("last_order"))
          .orderBy("o_custkey")
      },
      Some(s"""SELECT o_custkey, count(*) AS n_orders,
              ${sqlSum("o_totalprice")} AS amount,
              max(o_orderdate) AS last_order
              FROM orders GROUP BY 1 ORDER BY o_custkey"""),
      "incremental view refresh: delta agg states merged == full recompute"),

    // ── Cross-table money reconciliation: every order's header total
    // audited against the recomputed sum of its line items, banded by
    // relative mismatch — the dq-family check accountants actually run
    // (the reference's load_accounting_data.py trusts headers blindly).
    // Exact integer cents on both sides; the 1% band test is the
    // integer inequality diff*100 <= total_cents (no float thresholds).
    // One lineitem aggregation + one orders-keyed left join; both keyed
    // by o_orderkey, the natural 100 TB partitioning.
    "dq07_order_reconcile" -> QueryDef(
      (s, d) => {
        val liTot = li(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sum(expr(
            """CAST(floor(l_extendedprice * (1 - l_discount)
                 * (1 + l_tax) * 100 + 0.5d) AS BIGINT)"""))
            .as("li_cents"))
        ord(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"),
            expr("CAST(floor(o_totalprice * 100 + 0.5d) AS BIGINT)")
              .as("hdr_cents"))
          .join(liTot, col("o_orderkey") === col("l_orderkey"), "left")
          .withColumn("band",
            when(col("li_cents").isNull, "no_lines")
              .when(col("hdr_cents") === col("li_cents"), "exact")
              .when(abs(col("hdr_cents") - col("li_cents")) * 100
                <= col("hdr_cents"), "le_1pct")
              .otherwise("gt_1pct"))
          .groupBy(col("o_orderstatus"), col("band"))
          .agg(count(lit(1)).as("n_orders"),
            sum(coalesce(abs(col("hdr_cents") - col("li_cents")), lit(0L)))
              .as("total_diff_cents"))
          .orderBy("o_orderstatus", "band")
      },
      Some("""
WITH lt AS (
  SELECT l_orderkey,
    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
      * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS li_cents
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o.o_orderstatus,
    CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS hdr_cents,
    lt.li_cents
  FROM orders o LEFT JOIN lt ON o.o_orderkey = lt.l_orderkey
)
SELECT o_orderstatus,
  CASE WHEN li_cents IS NULL THEN 'no_lines'
       WHEN hdr_cents = li_cents THEN 'exact'
       WHEN abs(hdr_cents - li_cents) * 100 <= hdr_cents THEN 'le_1pct'
       ELSE 'gt_1pct' END AS band,
  count(*) AS n_orders,
  CAST(sum(coalesce(abs(hdr_cents - li_cents), 0)) AS BIGINT)
    AS total_diff_cents
FROM j GROUP BY 1, 2 ORDER BY o_orderstatus, band"""),
      "order header vs line-item totals, banded by integer-exact mismatch"),

    // ── Benford first-digit audit: the distribution of leading digits of
    // order totals vs Benford's law — the classic forensic-accounting
    // anomaly screen (fabricated or systematically generated amounts
    // don't follow it; this synthetic corpus visibly deviates, which IS
    // the audit's finding). Digit extraction goes through the CENTS
    // INTEGER rendered as a string — floats format differently across
    // engines, exact integers don't. Shares and the Benford reference
    // are fixed-pointed to ppm (the x36 discipline: one multiply + one
    // divide of exact inputs per scalar, ln per-scalar); the deviation
    // column is a pure integer difference. One aggregation, 9 rows.
    "dq08_benford" -> QueryDef(
      (s, d) => {
        // guard on the DERIVED digit, not the raw price: a price in
        // (0, 0.005) rounds to 0 cents, whose leading "digit" is 0 and
        // whose Benford term ln(1 + 1/0) is Infinity-garbage on Spark
        // but an error on DuckDB (r4 ADVICE) — both engines drop the
        // row identically instead
        val digits = ord(s, d)
          .filter(col("o_totalprice") > 0d)
          .select(expr(
            """CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5d)
                 AS BIGINT) AS STRING), 1, 1) AS BIGINT)""").as("d"))
          .filter(col("d").between(1L, 9L))
        val tot = digits.agg(count(lit(1)).as("n"))
        digits.groupBy("d").agg(count(lit(1)).as("n_orders"))
          .crossJoin(broadcast(tot))
          .select(col("d"), col("n_orders"),
            expr("""CAST(floor(CAST(n_orders AS DOUBLE) * 1000000
                    / CAST(n AS DOUBLE) + 0.5d) AS BIGINT)""")
              .as("share_ppm"),
            expr("""CAST(floor(ln(1.0d + 1.0d / CAST(d AS DOUBLE))
                    / ln(10.0d) * 1000000 + 0.5d) AS BIGINT)""")
              .as("benford_ppm"))
          .withColumn("dev_ppm", col("share_ppm") - col("benford_ppm"))
          .orderBy("d")
      },
      Some("""
WITH digits0 AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM orders WHERE o_totalprice > 0
),
digits AS (SELECT d FROM digits0 WHERE d BETWEEN 1 AND 9),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM digits)
SELECT d, CAST(count(*) AS BIGINT) AS n_orders,
  CAST(floor(CAST(count(*) AS DOUBLE) * 1000000
    / CAST(tot.n AS DOUBLE) + 0.5) AS BIGINT) AS share_ppm,
  CAST(floor(ln(1.0 + 1.0 / CAST(d AS DOUBLE)) / ln(10.0) * 1000000
    + 0.5) AS BIGINT) AS benford_ppm,
  CAST(floor(CAST(count(*) AS DOUBLE) * 1000000
    / CAST(tot.n AS DOUBLE) + 0.5) AS BIGINT)
  - CAST(floor(ln(1.0 + 1.0 / CAST(d AS DOUBLE)) / ln(10.0) * 1000000
    + 0.5) AS BIGINT) AS dev_ppm
FROM digits CROSS JOIN tot GROUP BY d, tot.n ORDER BY d"""),
      "Benford first-digit screen over order totals, ppm fixed-point"),

    // ── Functional-dependency audit: for declared candidate FDs X → Y,
    // how many X-keys map to MORE than one distinct Y — the
    // denormalization-drift screen a warehouse runs after every load
    // (a "should-be-determined" column acquiring second values is how
    // silent fan-out bugs and bad upserts surface). One key-partitioned
    // countDistinct per FD (map-side partial agg); the violation rate is
    // one IEEE division of exact integers. FDs audited: does an order
    // keep one return status; does a part come from one supplier; does
    // a customer stick to one order priority — all EXPECTED to have
    // violations in TPC-H-shaped data, which is the point: the audit
    // measures, the owner decides the threshold.
    "dq09_fd_audit" -> QueryDef(
      (s, d) => {
        def fd(df: org.apache.spark.sql.DataFrame, name: String,
            x: String, y: String) =
          df.groupBy(col(x)).agg(countDistinct(col(y)).as("dy"))
            .agg(lit(name).as("fd"),
              count(lit(1)).as("n_keys"),
              sum(when(col("dy") > 1, 1L).otherwise(0L))
                .as("violating_keys"),
              max(col("dy")).as("max_distinct"))
        fd(li(s, d), "l_orderkey->l_returnflag", "l_orderkey",
            "l_returnflag")
          .unionByName(fd(li(s, d), "l_partkey->l_suppkey", "l_partkey",
            "l_suppkey"))
          .unionByName(fd(ord(s, d), "o_custkey->o_orderpriority",
            "o_custkey", "o_orderpriority"))
          .withColumn("violation_rate",
            col("violating_keys").cast("double") /
              col("n_keys").cast("double"))
          .orderBy("fd")
      },
      Some("""
WITH f1 AS (
  SELECT 'l_orderkey->l_returnflag' AS fd,
    CAST(count(*) AS BIGINT) AS n_keys,
    CAST(sum(CASE WHEN dy > 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS violating_keys,
    CAST(max(dy) AS BIGINT) AS max_distinct
  FROM (SELECT l_orderkey, count(DISTINCT l_returnflag) AS dy
        FROM lineitem GROUP BY 1)
),
f2 AS (
  SELECT 'l_partkey->l_suppkey',
    CAST(count(*) AS BIGINT),
    CAST(sum(CASE WHEN dy > 1 THEN 1 ELSE 0 END) AS BIGINT),
    CAST(max(dy) AS BIGINT)
  FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS dy
        FROM lineitem GROUP BY 1)
),
f3 AS (
  SELECT 'o_custkey->o_orderpriority',
    CAST(count(*) AS BIGINT),
    CAST(sum(CASE WHEN dy > 1 THEN 1 ELSE 0 END) AS BIGINT),
    CAST(max(dy) AS BIGINT)
  FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS dy
        FROM orders GROUP BY 1)
),
u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2
      UNION ALL SELECT * FROM f3)
SELECT fd, n_keys, violating_keys, max_distinct,
  CAST(violating_keys AS DOUBLE) / CAST(n_keys AS DOUBLE)
    AS violation_rate
FROM u ORDER BY fd"""),
      "candidate-FD violation screen (denormalization-drift audit)"),

    // ── J16: bloom-prefiltered join — the fact side (lineitem) is
    // pruned by a bloom filter built over the small filtered dimension
    // BEFORE the join shuffle ([[Joins.bloomPrefilter]]). The declared
    // result is the plain inner join's (bloom false positives die in
    // the join), so the oracle is the plain SQL join — what the bloom
    // changes is WHERE rows die: map-side at the scan, not after
    // shuffling 100 TB of non-matching fact rows. PlanSpec pins that
    // the prefilter runs below the join's exchange.
    "j16_bloom_semi_join" -> QueryDef(
      (s, d) => {
        val small = ord(s, d).filter(col("o_totalprice") > 400000d)
          .select(col("o_orderkey"), col("o_orderdate"))
        val big = li(s, d)
          .select(col("l_orderkey"), col("l_extendedprice"))
        Joins.bloomPrefilter(big, "l_orderkey", small, "o_orderkey",
            expectedItems = 100000L, numBits = 800000L)
          .join(small, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(count(lit(1)).as("n_items"),
            moneySum(col("l_extendedprice")).as("revenue"))
          .orderBy("o_orderkey")
      },
      Some(s"""
SELECT o_orderkey, o_orderdate, count(*) AS n_items,
  ${sqlSum("l_extendedprice")} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice > 400000
GROUP BY 1, 2 ORDER BY o_orderkey"""),
      "bloom semi-join reduction: prune the fact side before the shuffle"),

    // ── J17: interval-overlap via boundary sweep — "how many order
    // lines does each supplier have ACTIVE (between its order and ship
    // events) at once, and for how many days ≥ 2?" The naive spelling
    // is an interval SELF-join (quadratic in overlaps); the scalable
    // spelling never joins intervals at all: each interval emits a
    // +1/-1 boundary, boundaries pre-aggregate per (supplier, day) —
    // partial map-side — and a per-supplier running sum IS the
    // concurrency curve; day-spans between consecutive boundaries
    // weight it. One equi-join (orderkey) + one key-partitioned window:
    // both scale on high-cardinality keys. Half-open [lo, hi+1) makes
    // a same-day pair count as one active day. Endpoints normalize via
    // least/greatest — the synthetic tables don't enforce order≤ship,
    // and a sweep is only correct over well-formed intervals
    // (OverlapSweepSpec pins equality with the naive day-grid count).
    "j17_overlap_sweep" -> QueryDef(
      (s, d) => {
        val iv = li(s, d)
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_shipdate").cast("date").as("ship"))
          .join(ord(s, d).select(col("o_orderkey"),
            col("o_orderdate").cast("date").as("odate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey"),
            least(col("odate"), col("ship")).as("lo"),
            greatest(col("odate"), col("ship")).as("hi"))
        // both boundaries fan out map-side from ONE pass over the join
        // (a unionAll of two projections would plan and execute the
        // join subtree twice)
        val b = iv.select(col("l_suppkey"), explode(array(
            struct(col("lo").as("day"), lit(1).as("delta")),
            struct(date_add(col("hi"), 1).as("day"),
              lit(-1).as("delta")))).as("e"))
          .select(col("l_suppkey"), col("e.day").as("day"),
            col("e.delta").as("delta"))
        val w = Window.partitionBy("l_suppkey").orderBy("day")
        b.groupBy(col("l_suppkey"), col("day"))
          .agg(sum(col("delta")).as("delta"))
          .withColumn("open_lines", sum(col("delta")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("span_days",
            datediff(lead(col("day"), 1).over(w), col("day"))
              .cast("bigint"))
          .groupBy(col("l_suppkey"))
          .agg(max(col("open_lines")).as("peak_open"),
            sum(when(col("open_lines") >= 2, col("span_days")))
              .as("days_ge2"))
          .orderBy("l_suppkey")
      },
      Some("""
WITH iv AS (
  SELECT l_suppkey,
    least(CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lo,
    greatest(CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) + 1
      AS hi
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
b AS (
  SELECT l_suppkey, lo AS day, 1 AS delta FROM iv
  UNION ALL
  SELECT l_suppkey, hi AS day, -1 AS delta FROM iv
),
agg AS (SELECT l_suppkey, day, sum(delta) AS delta FROM b GROUP BY 1, 2),
sw AS (
  SELECT l_suppkey, day,
    sum(delta) OVER (PARTITION BY l_suppkey ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_lines,
    lead(day) OVER (PARTITION BY l_suppkey ORDER BY day) AS next_day
  FROM agg
)
SELECT l_suppkey, CAST(max(open_lines) AS BIGINT) AS peak_open,
  CAST(sum(CASE WHEN open_lines >= 2
    THEN date_diff('day', day, next_day) END) AS BIGINT) AS days_ge2
FROM sw GROUP BY 1 ORDER BY l_suppkey"""),
      "interval concurrency by boundary sweep: no interval self-join"),

    // ── W10: frame-boundary window values — first/last/nth over an
    // explicit full-partition frame (last_value over the DEFAULT frame
    // is the classic silent bug: it returns the CURRENT row because the
    // frame ends there; pinning ROWS BETWEEN UNBOUNDED PRECEDING AND
    // UNBOUNDED FOLLOWING on both engines is the point of this entry).
    // One orderkey-keyed shuffle serves all four expressions; the
    // (l_shipdate, l_linenumber, l_partkey) ordering is a total order
    // within the partition (the synthetic data repeats line numbers,
    // so the part key tiebreak is load-bearing), making every value
    // deterministic.
    "w10_frame_values" -> QueryDef(
      (s, d) => {
        val full = Window.partitionBy("l_orderkey")
          .orderBy(col("l_shipdate"), col("l_linenumber"), col("l_partkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        li(s, d)
          .withColumn("first_part", first(col("l_partkey")).over(full))
          .withColumn("last_part", last(col("l_partkey")).over(full))
          .withColumn("second_part",
            nth_value(col("l_partkey"), 2).over(full))
          .withColumn("n_lines", count(lit(1)).over(full))
          .filter(col("l_linenumber") === 1)
          .select(col("l_orderkey"), col("first_part"), col("last_part"),
            col("second_part"), col("n_lines"))
          .orderBy("l_orderkey")
      },
      Some("""
SELECT l_orderkey, first_part, last_part, second_part, n_lines
FROM (
  SELECT l_orderkey, l_linenumber,
    first_value(l_partkey) OVER w AS first_part,
    last_value(l_partkey) OVER w AS last_part,
    nth_value(l_partkey, 2) OVER w AS second_part,
    count(*) OVER w AS n_lines
  FROM lineitem
  WINDOW w AS (PARTITION BY l_orderkey
    ORDER BY l_shipdate, l_linenumber, l_partkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
WHERE l_linenumber = 1 ORDER BY l_orderkey"""),
      "first/last/nth frame values with the full-frame pin"),

    // ── W11: exact running distinct count — how many DISTINCT event
    // types has each user touched as of each day? COUNT(DISTINCT) is
    // not a windowable aggregate, and the usual workaround (collect_set
    // over a frame) carries the whole set per row; the scalable
    // spelling marks each (user, type)'s FIRST day (one min-agg) and
    // runs a plain SUM window over daily first-occurrence counts —
    // state per row is one integer. Two shuffles, both user-keyed.
    "w11_running_distinct" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .groupBy(col("user_id"), col("event_type"))
          .agg(date_trunc("day", min(col("ts"))).cast("timestamp_ntz")
            .as("day"))
          .groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("n_new"))
          .withColumn("distinct_types_to_date", sum(col("n_new")).over(w))
          .select(col("user_id"), col("day"), col("n_new").cast("bigint")
            .as("n_new"), col("distinct_types_to_date"))
          .orderBy("user_id", "day")
      },
      Some("""
WITH firsts AS (
  SELECT user_id, event_type,
    CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS day
  FROM events GROUP BY 1, 2
),
daily AS (
  SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_new
  FROM firsts GROUP BY 1, 2
)
SELECT user_id, day, n_new,
  CAST(sum(n_new) OVER (PARTITION BY user_id ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS distinct_types_to_date
FROM daily ORDER BY user_id, day"""),
      "exact rolling distinct via first-occurrence flags + plain sum"),

    // ── W12: month-over-month growth — the delta/percent-change report
    // every revenue dashboard opens with. One month-keyed aggregation
    // (partial map-side), then lag() over the months table, which is
    // bounded (12 rows/year) regardless of corpus size. The revenues
    // are exact DECIMAL-summed doubles, and growth is the same
    // two-step IEEE chain ((rev − prev) / prev) on both engines, so
    // the percentages are bit-identical; the first month's growth is
    // NULL on both.
    "w12_mom_growth" -> QueryDef(
      (s, d) => {
        val w = Window.orderBy("month")
        ord(s, d)
          .groupBy(date_trunc("month", col("o_orderdate"))
            .cast("timestamp_ntz").as("month"))
          .agg(moneySum(col("o_totalprice")).as("revenue"))
          .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
          .withColumn("growth_pct",
            (col("revenue") - col("prev_revenue")) /
              col("prev_revenue") * 100d)
          .orderBy("month")
      },
      Some(s"""
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
    ${sqlSum("o_totalprice")} AS revenue
  FROM orders GROUP BY 1
)
SELECT month, revenue,
  lag(revenue) OVER (ORDER BY month) AS prev_revenue,
  (revenue - lag(revenue) OVER (ORDER BY month))
    / lag(revenue) OVER (ORDER BY month) * 100 AS growth_pct
FROM m ORDER BY month"""),
      "month-over-month revenue growth: bounded window, exact deltas"),

    // ── O15: Z-order (Morton) layout key over (o_custkey, o_orderkey)
    // — the multi-dimensional layout key: data written sorted by zkey
    // clusters BOTH dimensions, so parquet min/max pruning serves
    // either-column predicates from the same file order (the classic
    // data-skipping move for 100 TB scans; a single-column sort only
    // skips for that column). Each dimension is RANK-NORMALIZED to
    // 16 bits before interleaving — interleaving raw values is wrong
    // whenever ranges differ (every high z-bit would come from the
    // wide dimension and the narrow one never prunes; rank space is
    // what production OPTIMIZE-ZORDER implementations interleave,
    // via range-partition ids). LayoutQuantizeSpec proves the skipping
    // on both dims against a single-sort control. The ranks are EXACT
    // and DISTRIBUTED ([[Ranks.globalRank]]: range exchange +
    // in-partition sort/stamp + bounded offset join — no
    // single-partition window over the orders table, which grows with
    // the data); the interleave itself is 32 pure-arithmetic terms,
    // engine-portable and codegen'd.
    "o15_zorder_key" -> QueryDef(
      (s, d) => {
        val base = ord(s, d)
          .select(col("o_orderkey"), col("o_custkey"))
        val n1 = base.agg(count(lit(1)).cast("bigint").as("n"))
        Ranks.globalRank(
            Ranks.globalRank(base,
              Seq(col("o_custkey"), col("o_orderkey")), "_rx"),
            Seq(col("o_orderkey")), "_ry")
          .crossJoin(broadcast(n1))
          .withColumn("xa", expr("(_rx - 1) * 65536 div n"))
          .withColumn("yb", expr("(_ry - 1) * 65536 div n"))
          .withColumn("zkey", expr(zTermsSpark))
          .select(col("o_orderkey"), col("o_custkey"), col("zkey"))
          .orderBy("o_orderkey")
      },
      Some(s"""
SELECT o_orderkey, o_custkey, $zTermsDuck AS zkey
FROM (SELECT o_orderkey, o_custkey,
        (CAST(row_number() OVER (ORDER BY o_custkey, o_orderkey) AS BIGINT)
          - 1) * 65536 // count(*) OVER () AS xa,
        (CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT)
          - 1) * 65536 // count(*) OVER () AS yb
      FROM orders)
ORDER BY o_orderkey"""),
      "rank-space Morton key: sort once, prune scans on either dim")
  )

  /** 16-bit × 16-bit Morton interleave as pure integer arithmetic —
    * `((xa div 2^i) % 2) * 2^(2i) + ((yb div 2^i) % 2) * 2^(2i+1)`
    * summed over i — spelled per dialect from one generator so the two
    * engines stay in lockstep. Inputs are pre-masked non-negative.
    */
  private def zTerms(div: String): String =
    (0 until 16).flatMap { i =>
      Seq(s"((xa $div ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"((yb $div ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString("CAST(", " + ", " AS BIGINT)")
  private val zTermsSpark = zTerms("div")
  private val zTermsDuck = zTerms("//")
}
