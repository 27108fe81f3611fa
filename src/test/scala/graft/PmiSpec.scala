package graft

import org.apache.spark.sql.functions._

/** x75: every returned collocation's pair count recounted by a JVM
  * sliding-window brute force on sf0.001, plus ordering/normalization
  * invariants. (Counts are exact; the log fixed-pointing itself is
  * pinned engine-to-engine by the oracle hash compare.)
  */
class PmiSpec extends SparkSpec {

  test("x75 pair counts match brute force; ordering invariants hold") {
    val docs = Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0).split(" "))
    val cab = collection.mutable.Map.empty[(String, String), Long]
    val uni = collection.mutable.Map.empty[String, Long]
    docs.foreach { w =>
      w.foreach(t => uni(t) = uni.getOrElse(t, 0L) + 1)
      for (i <- w.indices.dropRight(1);
           o <- 1 to math.min(4, w.length - 1 - i)) {
        val k = if (w(i) <= w(i + o)) (w(i), w(i + o))
                else (w(i + o), w(i))
        cab(k) = cab.getOrElse(k, 0L) + 1
      }
    }
    val rows = operators.PipelineQueries.defs("x75_pmi_collocations")
      .fn(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a <= b, s"pair not normalized: ($a,$b)")
      assert(n >= 20L)
      assert(cab((a, b)) == n, s"count mismatch ($a,$b)")
    }
    val pmis = rows.map(_.getLong(3)).toSeq
    assert(pmis == pmis.sorted.reverse, "not sorted by pmi desc")
    spark.catalog.clearCache()
  }
}
