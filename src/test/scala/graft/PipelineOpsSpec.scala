package graft

import java.security.MessageDigest

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Semantic pins for the corpus-scoring / profiling / transition queries
  * (x36, x37, dq04, e10) beyond the driver's DuckDB hash-compare:
  * independent recomputation where affordable, exact invariants where
  * recomputation would just repeat the implementation.
  */
class PipelineOpsSpec extends SparkSpec {

  test("x36: scores are valid log-probs and duplicate texts tie exactly") {
    val rows = SparkEntry.queries("x36_unigram_logprob")(spark, sf).collect()
    assert(rows.nonEmpty)
    // every avg log-prob is ≤ 0 (probabilities ≤ 1) and finite
    rows.foreach { r =>
      val lp = r.getAs[Double]("avg_logprob")
      assert(lp <= 0.0 && !lp.isNaN && !lp.isInfinite, r.toString)
    }
    // identical texts must score identically (pure function of tokens)
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val score = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logprob")).toMap
    texts.groupBy(_._2).values.filter(_.size > 1).foreach { dup =>
      val ss = dup.keys.map(score).toSet
      assert(ss.size == 1, s"duplicate texts scored differently: $dup")
    }
  }

  test("x37: kept set is exactly the seeded-hash prefix under the budget") {
    val got = SparkEntry.queries("x37_token_budget_mix")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens")))
    // independent reimplementation: md5 in the JVM, prefix sums in Scala
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      val ordered = ds.toSeq.sortBy(d => md5hex(s"mix0|${d._2}"))
      val cums = ordered.scanLeft(0L)(_ + _._3).tail
      ordered.zip(cums).collect {
        case ((_, id, n), cum) if cum - n < 4000L => (src, id, n, cum)
      }
    }.toSet
    assert(got.toSet == expected,
      s"got ${got.size} rows, expected ${expected.size}")
  }

  test("x39: bigram scores match an exact JVM recomputation") {
    val got = SparkEntry.queries("x39_bigram_logprob")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("lp_micro_sum")))
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val pairsByDoc = docs.map { case (id, text) =>
      val t = text.split(" ", -1)
      id -> t.indices.dropRight(1).map(i => (t(i), t(i + 1)))
    }
    val allPairs = pairsByDoc.flatMap(_._2)
    val cb = allPairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cp = allPairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val vocab = docs.flatMap(_._2.split(" ", -1)).distinct.size.toLong
    // same arithmetic as the query: JVM Math.log IS Spark's ln codegen
    def lpMicro(p: (String, String)): Long =
      math.floor(math.log((cb(p) + 1).toDouble / (cp(p._1) + vocab))
        * 1000000d + 0.5d).toLong
    val expected = pairsByDoc.collect {
      case (id, ps) if ps.nonEmpty =>
        (id, ps.size.toLong, ps.map(lpMicro).sum)
    }.toSet
    assert(got.toSet == expected,
      s"got ${got.size} rows, expected ${expected.size}")
  }

  test("dq04: profile matches per-column recomputation, in ONE table scan") {
    val df = SparkEntry.queries("dq04_table_profile")(spark, sf)
    val nScans = df.queryExecution.sparkPlan.collectLeaves()
      .collect { case f: FileSourceScanExec => f }.size
    assert(nScans == 1, s"profile should read lineitem once, saw $nScans")
    val r = df.collect().head
    val li = Tables.lineitem(spark, sf)
    assert(r.getAs[Long]("n_rows") == li.count())
    assert(r.getAs[Long]("ndv_suppkey") ==
      li.select("l_suppkey").distinct().count())
    assert(r.getAs[Long]("ndv_returnflag") ==
      li.select("l_returnflag").distinct().count())
    assert(r.getAs[Long]("nulls_discount") ==
      li.filter(col("l_discount").isNull).count())
    assert(r.getAs[Double]("min_quantity") ==
      li.agg(min("l_quantity")).collect().head.getDouble(0))
  }

  test("e10: rows per from_event sum to 1.0 and to the transition total") {
    val rows = SparkEntry.queries("e10_event_transitions")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("from_event"), r.getAs[Long]("n"),
        r.getAs[Double]("p")))
    rows.groupBy(_._1).values.foreach { grp =>
      assert(math.abs(grp.map(_._3).sum - 1.0) < 1e-9)
    }
    // each user with k events contributes k-1 transitions
    val ev = Tables.events(spark, sf)
    val total = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._2).sum == total)
  }
}
