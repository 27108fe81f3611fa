package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the audit/window batch (e11, dq05, w10, x38):
  * independent recomputation in plain Scala at sf0.001, exact where the
  * query is exact.
  */
class AuditQueriesSpec extends SparkSpec {

  test("e11: outlier flag equals the exact BigInt 2-sigma test") {
    val rows = SparkEntry.queries("e11_volume_zscore")(spark, sf)
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("day"),
        r.getAs[Long]("n_events"), r.getAs[Boolean]("is_outlier")))
    val xs = rows.map(_._2).map(BigInt(_))
    val (n, sx, sxx) = (BigInt(xs.size), xs.sum, xs.map(x => x * x).sum)
    rows.foreach { case (_, x, flag) =>
      val dev = n * BigInt(x) - sx
      val expect = dev * dev * (n - 1) > BigInt(4) * n * (n * sxx - sx * sx)
      assert(flag == expect, s"day with $x events")
    }
    // data sanity: the test only means something if both classes occur
    assert(rows.exists(_._3) && rows.exists(!_._3))
  }

  test("w10: frame values match a driver-side sort per order") {
    val got = SparkEntry.queries("w10_frame_values")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3), r.getLong(4)))
    val lines = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_shipdate", "l_linenumber", "l_partkey")
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1)
          .toEpochSecond(java.time.ZoneOffset.UTC),
        r.getInt(2), r.getLong(3)))
      .groupBy(_._1)
    got.foreach { case (ok, fp, lp, sp, n) =>
      val sorted = lines(ok).sortBy(t => (t._2, t._3, t._4))
      assert(n == sorted.size)
      assert(fp == sorted.head._4 && lp == sorted.last._4)
      val expSecond = if (sorted.size >= 2) sorted(1)._4 else null
      assert(sp == expSecond, s"order $ok")
    }
  }

  test("dq05: staleness rows match direct max() scans") {
    val got = SparkEntry.queries("dq05_freshness")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got.keySet == Set("events", "orders"))
    val evMax = Tables.events(spark, sf)
      .agg(expr("CAST(datediff(TIMESTAMP '1998-12-31 00:00:00', max(ts)) AS BIGINT)"))
      .collect().head.getLong(0)
    assert(got("events") == evMax)
  }

  test("w11: running distinct equals a per-user set replay") {
    val got = SparkEntry.queries("w11_running_distinct")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate.toString),
        (r.getLong(2), r.getLong(3)))).toMap
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[java.time.LocalDateTime](2)))
    ev.groupBy(_._1).foreach { case (user, rows) =>
      val firstDay = rows.groupBy(_._2).view
        .mapValues(_.map(_._3).min(Ordering.fromLessThan[
          java.time.LocalDateTime](_ isBefore _)).toLocalDate).toMap
      val days = firstDay.values.toSeq.distinct.sorted(
        Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
      var cum = 0L
      days.foreach { day =>
        val nNew = firstDay.values.count(_ == day).toLong
        cum += nNew
        assert(got((user, day.toString)) == ((nNew, cum)),
          s"user $user day $day")
      }
    }
  }

  test("dq06: uniqueness audit fires on the composite key, only there") {
    val rows = SparkEntry.queries("dq06_key_uniqueness")(spark, sf)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    assert(rows.keySet == Set("orders", "customer", "supplier",
      "documents", "lineitem"))
    rows.filter(_._1 != "lineitem").values.foreach {
      case (n, k, d, u) => assert(n == k && d == 0L && u)
    }
    val (n, k, d, u) = rows("lineitem")
    assert(!u && d > 0L && n - k == d)
    val dupes = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey", "l_linenumber")
      .count().filter(col("count") > 1)
      .agg(sum(col("count") - 1)).collect().head.getLong(0)
    assert(d == dupes)
  }

  test("a14: exact covariance matches BigInt replay and covar_samp") {
    val got = SparkEntry.queries("a14_exact_covariance")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> r.getAs[Double]("cov_qty_price")).toMap
    val rows = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0),
        BigInt(math.floor(r.getDouble(1) * 100 + 0.5).toLong),
        BigInt(math.floor(r.getDouble(2) * 100 + 0.5).toLong)))
    rows.groupBy(_._1).foreach { case (flag, grp) =>
      val n = BigInt(grp.length)
      val (sx, sy) = (grp.map(_._2).sum, grp.map(_._3).sum)
      val sxy = grp.map(t => t._2 * t._3).sum
      val expect = (n * sxy - sx * sy).toDouble /
        (n.toDouble * (n - 1).toDouble * 10000.0)
      assert(got(flag) == expect, s"flag $flag")
      // and the integer-moment formula agrees with Spark's own
      // (order-dependent) covar_samp to float precision
      val ref = Tables.lineitem(spark, sf)
        .filter(col("l_returnflag") === flag)
        .agg(covar_samp(col("l_quantity"), col("l_extendedprice")))
        .collect().head.getDouble(0)
      assert(math.abs(got(flag) - ref) / math.abs(ref) < 1e-6,
        s"flag $flag: ${got(flag)} vs covar_samp $ref")
    }
  }

  test("e12: quartiles are balanced and the segment encodes them") {
    val rows = SparkEntry.queries("e12_rfm_segments")(spark, sf).collect()
      .map(r => (r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(7)))
    Seq[((Long, Long, Long, String)) => Long](_._1, _._2, _._3)
      .foreach { dim =>
        val sizes = rows.groupBy(dim).values.map(_.size).toSeq
        assert(sizes.max - sizes.min <= 1, s"unbalanced: $sizes")
      }
    rows.foreach { case (r, f, m, seg) => assert(seg == s"$r$f$m") }
  }

  test("x40: pairwise shared fingerprints match a Scala set intersect") {
    val got = SparkEntry.queries("x40_source_overlap")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bySource = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        md5hex(r.getString(1).split(" ", -1).take(5).mkString(" "))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = (for {
      a <- bySource.keys; b <- bySource.keys if a < b
      n = (bySource(a) & bySource(b)).size if n > 0
    } yield (a, b) -> n.toLong).toMap
    assert(got == expected)
  }

  test("w12: growth percentages replay from the revenue series") {
    val rows = SparkEntry.queries("w12_mom_growth")(spark, sf).collect()
      .map(r => (r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.head._2.isEmpty && rows.head._3.isEmpty)
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur._2.contains(prev._1))
      assert(cur._3.contains((cur._1 - prev._1) / prev._1 * 100d))
    }
  }

  test("e13: co-occurrence counts and lift replay from user sets") {
    val got = SparkEntry.queries("e13_type_cooccurrence")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("lift"))).toMap
    val fs = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = fs.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val nUsers = fs.map(_._1).distinct.length.toLong
    val expected = (for {
      a <- byType.keys; b <- byType.keys if a < b
      both = (byType(a) & byType(b)).size.toLong if both > 0
    } yield (a, b) -> (both,
      (both * nUsers).toDouble /
        (byType(a).size.toLong * byType(b).size.toLong).toDouble)).toMap
    assert(got == expected)
  }

  test("x38: per-language top pairs match a Scala recount") {
    val got = SparkEntry.queries("x38_bpe_pair_stats")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = docs.flatMap { case (lang, text) =>
        val t = text.split(" ", -1)
        t.indices.dropRight(1).map(i => (lang, t(i) + " " + t(i + 1)))
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.groupBy(_._1).foreach { case (lang, rows) =>
      val expTop = counts.collect { case ((l, p), n) if l == lang => (p, n) }
        .toSeq.sortBy { case (p, n) => (-n, p) }.take(5)
      val gotTop = rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(gotTop == expTop, s"lang $lang")
    }
  }
}
