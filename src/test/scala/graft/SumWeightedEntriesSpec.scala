package graft

import org.apache.spark.sql.functions._

/** `sum_weighted_entries` — the packed-entries keyed weighted sum behind
  * x73's 1:1 score join — checked against the fan-out groupBy-sum
  * spelling it replaces, across partitionings (partial/merge path) and
  * null inputs, plus an end-to-end old-vs-new x73 equality pin.
  */
class SumWeightedEntriesSpec extends SparkSpec {

  private def fanout(rows: org.apache.spark.sql.DataFrame) = rows
    .select(col("g"), explode(col("entries")).as("e"), col("k"))
    .groupBy(col("g"), col("e.src").as("src"))
    .agg(sum(col("k") * col("e.dlp")).as("s"))
    .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
    .toMap

  private def viaAgg(rows: org.apache.spark.sql.DataFrame) = {
    graft.GraftExtensions.install(spark)
    rows.groupBy(col("g"))
      .agg(expr("sum_weighted_entries(entries, k)").as("m"))
      .select(col("g"), explode(col("m")).as(Seq("src", "s")))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
  }

  private lazy val fixture = {
    import spark.implicits._
    Seq(
      (1L, Seq(("a", 3L), ("b", -2L)), 2L),
      (1L, Seq(("a", 5L)), 1L),
      (1L, Seq(("c", 7L), ("a", 1L)), 10L),
      (2L, Seq(("b", 4L)), 3L),
      (2L, Seq.empty[(String, Long)], 9L))
      .toDF("g", "raw", "k")
      .select(col("g"),
        transform(col("raw"),
          e => struct(e("_1").as("src"), e("_2").as("dlp"))).as("entries"),
        col("k"))
  }

  test("matches the fan-out groupBy-sum spelling") {
    val m = viaAgg(fixture)
    assert(m == fanout(fixture))
    assert(m((1L, "a")) == 3L * 2L + 5L * 1L + 1L * 10L)
    assert(m((1L, "c")) == 70L)
    assert(m((2L, "b")) == 12L)
  }

  test("partial/merge path: any partitioning gives the same maps") {
    for (p <- Seq(1, 7)) {
      assert(viaAgg(fixture.repartition(p)) == fanout(fixture))
    }
  }

  test("null entries arrays and null weights are skipped") {
    import spark.implicits._
    val withNulls = Seq(
      (1L, Some(Seq(("a", 2L))), Some(4L)),
      (1L, None, Some(5L)),
      (1L, Some(Seq(("a", 100L))), None))
      .toDF("g", "raw", "k")
      .select(col("g"),
        transform(col("raw"),
          e => struct(e("_1").as("src"), e("_2").as("dlp"))).as("entries"),
        col("k"))
    assert(viaAgg(withNulls) == Map((1L, "a") -> 8L))
  }

  test("null struct fields inside an entries array are skipped") {
    import spark.implicits._
    graft.GraftExtensions.install(spark)
    val rows = Seq(1L).toDF("g").select(col("g"),
      expr("""array(named_struct('src', CAST(NULL AS STRING), 'dlp', 5L),
                    named_struct('src', 'a', 'dlp', CAST(NULL AS BIGINT)),
                    named_struct('src', 'a', 'dlp', 2L))""").as("entries"),
      lit(3L).as("k"))
    assert(viaAgg(rows) == Map((1L, "a") -> 6L))
  }

  test("empty group yields an empty map, not null") {
    import spark.implicits._
    val empty = Seq((1L, Seq.empty[(String, Long)], 3L))
      .toDF("g", "raw", "k")
      .select(col("g"),
        transform(col("raw"),
          e => struct(e("_1").as("src"), e("_2").as("dlp"))).as("entries"),
        col("k"))
    graft.GraftExtensions.install(spark)
    val r = empty.groupBy(col("g"))
      .agg(expr("sum_weighted_entries(entries, k)").as("m"))
      .select(col("g"), size(col("m")).as("n")).collect()
    assert(r.map(x => (x.getLong(0), x.getInt(1))).toSeq == Seq((1L, 0)))
  }

  test("x73 equality pin: packed spelling == the fan-out spelling it replaced") {
    val sf = "/root/testdata/sf0.001"
    val LpScale = 1000000L
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("token"))
      .persist()
    val dt = toks.groupBy(col("doc_id"), col("source").as("actual"),
      col("token")).agg(count(lit(1)).as("k")).persist()
    val cnt = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"))
    val tot = toks.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val v = toks.select("token").distinct().agg(count(lit(1)).as("v"))
    // the pre-round-10 fan-out spelling, replicated verbatim
    val miss = tot.crossJoin(broadcast(v))
      .select(col("source").as("lm_source"),
        expr(s"""CAST(floor(ln(CAST(1 AS DOUBLE)
                   / CAST(n + v AS DOUBLE)) * $LpScale + 0.5d)
                 AS BIGINT)""").as("lp_miss"))
    val obs = cnt.join(tot, Seq("source")).crossJoin(broadcast(v))
      .select(col("source").as("lm_source"), col("token"),
        expr(s"""CAST(floor(ln(CAST(c + 1 AS DOUBLE)
                   / CAST(n + v AS DOUBLE)) * $LpScale + 0.5d)
                 AS BIGINT)""").as("lp"),
        expr(s"""CAST(floor(ln(CAST(1 AS DOUBLE)
                   / CAST(n + v AS DOUBLE)) * $LpScale + 0.5d)
                 AS BIGINT)""").as("lp_miss"))
    val docTot = dt.groupBy(col("doc_id"), col("actual"))
      .agg(sum(col("k")).as("ktot"))
    val base = docTot.crossJoin(broadcast(miss))
    val delta = dt.join(obs, Seq("token"))
      .groupBy(col("doc_id"), col("actual"), col("lm_source"))
      .agg(sum(col("k") * (col("lp") - col("lp_miss"))).as("dscore"))
    val old = base.join(delta, Seq("doc_id", "actual", "lm_source"), "left")
      .select(col("doc_id"), col("actual"), col("lm_source"),
        (col("ktot") * col("lp_miss") +
          coalesce(col("dscore"), lit(0L))).as("score"))
      .groupBy(col("doc_id"), col("actual"))
      .agg(min(struct((-col("score")).as("ns"),
        col("lm_source").as("src"))).as("top"))
      .groupBy(col("actual"), col("top.src").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("actual", "predicted")
      .collect().toSeq
    val now = graft.operators.PipelineQueries
      .defs("x73_source_attribution").fn(spark, sf)
      .collect().toSeq
    assert(now == old)
    toks.unpersist(); dt.unpersist()
    spark.catalog.clearCache()
  }
}
