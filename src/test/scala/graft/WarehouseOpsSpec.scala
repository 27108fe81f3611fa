package graft

import org.apache.spark.sql.functions._

/** o21 IVM merge, j20 salted join, dq07 reconciliation — each pinned
  * against its plain (unsalted / full-recompute) spelling on sf0.001.
  */
class WarehouseOpsSpec extends SparkSpec {

  test("o21: merged delta states equal the full recompute") {
    import graft.functions.Money
    val got = operators.RelationalQueries.defs("o21_ivm_merge")
      .fn(spark, sf).collect().toSeq
    val want = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        Money.moneySum(col("o_totalprice")).as("amount"),
        max(col("o_orderdate").cast("timestamp_ntz")).as("last_order"))
      .orderBy("o_custkey").collect().toSeq
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("j20: salted join equals the plain join rollup") {
    import graft.functions.Money
    val got = operators.RelationalQueries.defs("j20_salted_join")
      .fn(spark, sf).collect().toSeq
    val want = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"), col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        Money.moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderpriority", "l_returnflag").collect().toSeq
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("dq07: bands partition every order exactly once") {
    val rows = operators.RelationalQueries.defs("dq07_order_reconcile")
      .fn(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.orders(spark, sf).count())
    val bands = rows.map(_.getString(1)).toSet
    assert(bands.subsetOf(Set("exact", "le_1pct", "gt_1pct", "no_lines")))
    // exact band contributes zero diff
    rows.filter(_.getString(1) == "exact")
      .foreach(r => assert(r.getLong(3) == 0L))
    spark.catalog.clearCache()
  }

  test("dq08: shares sum to ~1e6 ppm and benford reference is fixed") {
    val rows = operators.RelationalQueries.defs("dq08_benford")
      .fn(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L))
    val shares = rows.map(_.getLong(2)).sum
    assert(math.abs(shares - 1000000L) <= 9L, s"shares sum $shares")
    // the Benford constants are data-independent
    val bf = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bf(1L) == 301030L && bf(9L) == 45757L)
    rows.foreach(r => assert(r.getLong(4) == r.getLong(2) - r.getLong(3)))
    spark.catalog.clearCache()
  }
}
