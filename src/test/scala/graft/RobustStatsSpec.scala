package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Semantic pins for the curriculum / robust-stats / source-sketch
  * queries (x50, x51, x52) beyond the driver's DuckDB hash-compare:
  * brute-force JVM recomputation where affordable (x51), structural
  * invariants (x50), and the algebraic property the scale argument
  * rests on (x52's monoid merge).
  */
class RobustStatsSpec extends SparkSpec {

  test("x50: schedule is a permutation with dense per-shard positions") {
    val rows = SparkEntry.queries("x50_curriculum_order")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("stage"),
        r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    val nDocs = Tables.documents(spark, sf).count()
    // every document appears exactly once
    assert(rows.length.toLong == nDocs)
    assert(rows.map(_._1).distinct.length.toLong == nDocs)
    // stages and shards stay in their declared ranges
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 9))
    assert(rows.forall(r => r._3 >= 0 && r._3 <= 3))
    // positions are dense 1..n within every (stage, shard)
    rows.groupBy(r => (r._2, r._3)).foreach { case (key, grp) =>
      val ps = grp.map(_._4).sorted.toSeq
      assert(ps == (1L to grp.length.toLong), s"gap in $key")
    }
    // determinism: a second run produces the identical schedule
    val again = SparkEntry.queries("x50_curriculum_order")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("stage"),
        r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(rows.toSeq == again.toSeq)
  }

  test("x51: median/MAD/outliers match a brute-force JVM recompute") {
    val got = SparkEntry.queries("x51_mad_outliers")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("med_tokens"),
          r.getAs[Long]("mad_tokens"), r.getAs[Long]("n_outliers"))))
      .toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // lower median = element at rank (n+1)/2 under a total (v, id) order
    def lowerMedian(vs: Seq[(Long, Long)]): Long = {
      val sorted = vs.sortBy(identity).map(_._1)
      sorted((sorted.length + 1) / 2 - 1)
    }
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val med = lowerMedian(ds.map(d => (d._3, d._2)).toSeq)
      val devs = ds.map(d => (math.abs(d._3 - med), d._2)).toSeq
      val mad = lowerMedian(devs)
      val out = devs.count(_._1 > 3 * mad).toLong
      src -> ((ds.length.toLong, med, mad, out))
    }
    assert(got == expected)
  }

  test("x52: sketch merges as a monoid and the estimator is bounded") {
    GraftExtensions.install(spark)
    val docs = Tables.documents(spark, sf)
    val whole = operators.DedupQueries.sourceSketch(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("idx")) ->
        r.getAs[Long]("mh")).toMap
    // split the corpus into two arbitrary shards; the elementwise min of
    // the shard sketches must equal the whole-corpus sketch
    val shardA = operators.DedupQueries
      .sourceSketch(docs.filter(col("doc_id") % 2 === 0)).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("idx")) ->
        r.getAs[Long]("mh")).toMap
    val shardB = operators.DedupQueries
      .sourceSketch(docs.filter(col("doc_id") % 2 === 1)).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("idx")) ->
        r.getAs[Long]("mh")).toMap
    val merged = (shardA.keySet ++ shardB.keySet).map { k =>
      k -> math.min(shardA.getOrElse(k, Long.MaxValue),
        shardB.getOrElse(k, Long.MaxValue))
    }.toMap
    assert(merged == whole)
    // pair surface: every unordered source pair once, estimates in [0, 1]
    val pairs = SparkEntry.queries("x52_source_sketch")(spark, sf).collect()
    val nSrc = docs.select("source").distinct().count()
    assert(pairs.length.toLong == nSrc * (nSrc - 1) / 2)
    pairs.foreach { r =>
      val e = r.getAs[Double]("est_jaccard")
      assert(e >= 0.0 && e <= 1.0)
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
  }

  /** Guards the md5-derived shard assignment in x50 against engine
    * drift: the Spark-side conv(substr(md5)) % shards must equal a JVM
    * recomputation (the same argument PipelineOpsSpec makes for x37).
    */
  test("x50: shard assignment matches a JVM md5 recompute") {
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = SparkEntry.queries("x50_curriculum_order")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard"))
    rows.foreach { case (id, shard) =>
      val expected =
        java.lang.Long.parseLong(md5hex(s"cur0|$id").take(15), 16) % 4
      assert(shard == expected, s"doc $id")
    }
  }
}
