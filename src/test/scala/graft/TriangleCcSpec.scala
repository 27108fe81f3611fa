package graft

import org.apache.spark.sql.functions._

/** x71 triangle counts: hand-computable clique fixture + JVM brute force
  * over the real sf0.001 co-purchase graph.
  */
class TriangleCcSpec extends SparkSpec {

  /** lineitem dir where order 1 buys parts {1,2,3} (a K3), order 2 buys
    * {3,4,5,6} (a K4), order 3 buys {1,2} (an edge, no closure).
    */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("x71").toString
    import spark.implicits._
    val rows = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 3L), (2L, 4L), (2L, 5L), (2L, 6L),
      (3L, 1L), (3L, 2L))
    rows.zipWithIndex.map { case ((ok, pk), i) =>
      (ok, pk, 1L, i + 1, 1.0d, 10.0d, 0.0d, 0.0d, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("clique fixture: K3 + K4 triangle counts and exact cc") {
    val got = operators.GraphQueries.triangleCc(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // (deg, triangles, cc_num, cc_den)
    assert(got(1L) == ((2L, 1L, 2L, 2L)))  // cc = 1: its one pair closes
    assert(got(2L) == ((2L, 1L, 2L, 2L)))
    assert(got(3L) == ((5L, 4L, 8L, 20L))) // K3 + 3 of K4's triangles
    assert(got(4L) == ((3L, 3L, 6L, 6L)))  // inside K4: cc = 1
    assert(got(5L) == ((3L, 3L, 6L, 6L)))
    assert(got(6L) == ((3L, 3L, 6L, 6L)))
    spark.catalog.clearCache()
  }

  test("sf0.001 matches a JVM brute force over the co-purchase graph") {
    val adj = {
      val byOrder = Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_partkey").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSeq
        .groupBy(_._1).values.map(_.map(_._2).distinct)
      val m = collection.mutable.Map.empty[Long, collection.mutable.Set[Long]]
      byOrder.foreach { pks =>
        for (a <- pks; b <- pks if a != b)
          m.getOrElseUpdate(a, collection.mutable.Set.empty) += b
      }
      m.map { case (k, v) => k -> v.toSet }.toMap
    }
    val want = adj.map { case (v, ns) =>
      val tri = ns.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }
      v -> ((ns.size.toLong, tri.toLong))
    }
    val got = operators.GraphQueries.triangleCc(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    // cc columns are consistent with deg/triangles
    operators.GraphQueries.triangleCc(spark, sf).collect().foreach { r =>
      assert(r.getLong(3) == 2 * r.getLong(2))
      assert(r.getLong(4) == r.getLong(1) * (r.getLong(1) - 1))
    }
    spark.catalog.clearCache()
  }
}
