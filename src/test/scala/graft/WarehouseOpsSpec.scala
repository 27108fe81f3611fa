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
}
