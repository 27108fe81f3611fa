package graft

import org.apache.spark.sql.functions._

/** Degenerate-graph robustness for the link-analysis family (the
  * EdgeCorpusSpec discipline applied to x46/x61/x71): a corpus where NO
  * order has two distinct items yields an EMPTY co-purchase graph, and
  * the uniform PageRank base would be an ANSI `div 0` without the n = 0
  * guard — a latent crash on real data (single-line carts are the
  * common case in some verticals, an all-singleton day is plausible).
  */
class EdgeGraphSpec extends SparkSpec {

  private def writeLineitem(rows: Seq[(Long, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_edge_graph").toString
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("an all-singleton-order corpus yields empty rankings, not a crash") {
    // every order holds exactly one part → zero edges, zero nodes
    val dir = writeLineitem(Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    val pr = operators.GraphQueries.partPagerank(spark, dir)
    assert(pr.columns.toSeq == Seq("p_partkey", "rank_fp"))
    assert(pr.count() == 0L)
    val lp = operators.GraphQueries.labelPropagation(spark, dir)
    assert(lp.count() == 0L)
    val tc = operators.GraphQueries.triangleCc(spark, dir)
    assert(tc.count() == 0L)
  }

  test("the serve twins survive the empty graph: artifacts build, the " +
      "manifest reads 0, rankings come back empty") {
    val dir = writeLineitem(Seq((1L, 10L), (2L, 20L)))
    for (name <- Seq("x46s_pagerank_serve", "x61s_communities_serve",
        "x71s_triangles_serve")) {
      val rows = SparkEntry.queries(name)(spark, dir).collect()
      assert(rows.isEmpty, s"$name returned ${rows.length} rows")
      spark.catalog.clearCache()
    }
    val n = java.nio.file.Files.readString(java.nio.file.Paths.get(
      operators.GraphServe.root(dir) + "/node_count.txt")).trim.toLong
    assert(n == 0L, s"manifest node count $n")
  }

  test("a single two-item order ranks both parts equally") {
    val dir = writeLineitem(Seq((1L, 10L), (1L, 20L), (2L, 30L)))
    val pr = operators.GraphQueries.partPagerank(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // part 30 is edge-less (singleton order) and must NOT appear;
    // 10 and 20 form a symmetric 2-cycle → identical ranks
    assert(pr.map(_._1).toSet == Set(10L, 20L))
    assert(pr.map(_._2).distinct.size == 1)
  }
}
