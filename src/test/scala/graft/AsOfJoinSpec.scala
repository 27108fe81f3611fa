package graft

import java.sql.Timestamp

/** Generic as-of join combinator: backward pick, null for unmatched,
  * deterministic tie-break, and no key requirement on the left frame.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before each left time") {
    val trades = Seq(
      ("AAPL", ts("2001-01-01 10:00:05"), 100),
      ("AAPL", ts("2001-01-01 10:00:00"), 50), // exact-time match counts
      ("MSFT", ts("2001-01-01 10:00:03"), 75),
      ("NVDA", ts("2001-01-01 10:00:03"), 10)) // no quotes at all
      .toDF("sym", "trade_ts", "qty")
    val quotes = Seq(
      ("AAPL", ts("2001-01-01 10:00:00"), 1.0),
      ("AAPL", ts("2001-01-01 10:00:03"), 2.0),
      ("AAPL", ts("2001-01-01 10:00:06"), 3.0), // after both trades
      ("MSFT", ts("2001-01-01 10:00:04"), 9.0)) // after the MSFT trade
      .toDF("qsym", "quote_ts", "px")
    val out = operators.Joins.asOf(trades, quotes,
        "sym", "qsym", "trade_ts", "quote_ts")
      .select("sym", "qty", "px").collect()
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(out == Set(
      ("AAPL", 100, 2.0), // latest quote <= 10:00:05 is 10:00:03
      ("AAPL", 50, 1.0),  // equal timestamps match (at-or-before)
      ("MSFT", 75, null), // only quote is after the trade
      ("NVDA", 10, null)))
  }

  test("ties on the winning time break deterministically") {
    val l = Seq(("k", ts("2001-01-01 00:00:10"))).toDF("k", "t")
    val r = Seq(
      ("k", ts("2001-01-01 00:00:05"), "a"),
      ("k", ts("2001-01-01 00:00:05"), "b"))
      .toDF("rk", "rt", "tag")
    val out = operators.Joins.asOf(l, r, "k", "rk", "t", "rt",
      tieBreak = Seq("tag"))
    assert(out.select("tag").collect().map(_.getString(0)).toSeq ==
      Seq("b")) // desc tie-break
  }

  test("shared key name survives exactly once (pandas on= usage)") {
    val l = Seq(
      ("u1", ts("2001-01-01 00:00:10"), "a"),
      ("u2", ts("2001-01-01 00:00:10"), "b"))
      .toDF("user_id", "t", "payload")
    val r = Seq(("u1", ts("2001-01-01 00:00:05"), 1.5))
      .toDF("user_id", "rt", "score")
    val out = operators.Joins.asOf(l, r, "user_id", "user_id", "t", "rt")
    assert(out.columns.count(_ == "user_id") == 1)
    val rows = out.select("user_id", "payload", "score").collect()
      .map(rr => (rr.getString(0), rr.getString(1),
        if (rr.isNullAt(2)) null else rr.getDouble(2))).toSet
    assert(rows == Set(("u1", "a", 1.5), ("u2", "b", null)))
  }

  test("forward picks the earliest right row at-or-after each left time") {
    val trades = Seq(
      ("AAPL", ts("2001-01-01 10:00:05"), 100), // next quote is 10:00:06
      ("AAPL", ts("2001-01-01 10:00:03"), 50),  // exact-time match counts
      ("MSFT", ts("2001-01-01 10:00:05"), 75),  // only quote is before
      ("NVDA", ts("2001-01-01 10:00:03"), 10))  // no quotes at all
      .toDF("sym", "trade_ts", "qty")
    val quotes = Seq(
      ("AAPL", ts("2001-01-01 10:00:03"), 2.0),
      ("AAPL", ts("2001-01-01 10:00:06"), 3.0),
      ("MSFT", ts("2001-01-01 10:00:04"), 9.0))
      .toDF("qsym", "quote_ts", "px")
    val out = operators.Joins.asOf(trades, quotes,
        "sym", "qsym", "trade_ts", "quote_ts", direction = "forward")
      .select("sym", "qty", "px").collect()
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(out == Set(
      ("AAPL", 100, 3.0),
      ("AAPL", 50, 2.0),
      ("MSFT", 75, null),
      ("NVDA", 10, null)))
  }

  test("nearest picks the smallest |Δt|; an exact tie prefers backward") {
    val l = Seq(
      ("k", ts("2001-01-01 00:00:10"), 1), // early Δ2 vs late Δ3
      ("k", ts("2001-01-01 00:00:11"), 2), // early Δ3 vs late Δ2
      ("x", ts("2001-01-01 00:00:10"), 3)) // no right rows
      .toDF("k", "t", "n")
    val r = Seq(
      ("k", ts("2001-01-01 00:00:08"), "early"),
      ("k", ts("2001-01-01 00:00:13"), "late"))
      .toDF("rk", "rt", "tag")
    val out = operators.Joins.asOf(l, r, "k", "rk", "t", "rt",
        direction = "nearest")
      .select("n", "tag").collect()
      .map(rr => (rr.getInt(0),
        if (rr.isNullAt(1)) null else rr.getString(1))).toSet
    assert(out == Set(
      (1, "early"), // Δ2 beats Δ3
      (2, "late"),  // Δ2 beats Δ3 the other way
      (3, null)))
  }

  test("nearest exact-distance tie prefers the backward row") {
    val l = Seq(("k", ts("2001-01-01 00:00:10"))).toDF("k", "t")
    val r = Seq(
      ("k", ts("2001-01-01 00:00:08"), "back"),
      ("k", ts("2001-01-01 00:00:12"), "fwd")) // both Δ2
      .toDF("rk", "rt", "tag")
    val out = operators.Joins.asOf(l, r, "k", "rk", "t", "rt",
      direction = "nearest")
    assert(out.select("tag").head().getString(0) == "back")
  }

  test("all three directions agree with a brute-force reference on a " +
      "seeded random frame") {
    // deterministic pseudo-random frames (LCG on the index — no RNG in
    // tests either), sized to force multi-partition execution and to
    // contain unmatched keys, exact-time matches, and distance ties
    val left = (1 to 400).map { i =>
      val k = "k" + (i * 7919 % 13)
      (k, ((i * 104729) % 97).toLong, i)
    }.toDF("k", "t", "lid")
    val right = (1 to 300).map { i =>
      val k = "k" + (i * 6271 % 17) // keys 13-16 never match left
      (k, ((i * 15485863) % 97).toLong, "r" + i)
    }.toDF("rk", "rt", "tag")
    val rightRows = right.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def reference(direction: String): Set[(Int, Option[String])] = {
      left.collect().map { lr =>
        val (k, t, lid) = (lr.getString(0), lr.getLong(1), lr.getInt(2))
        val matches = rightRows.filter(_._1 == k)
        val pick = direction match {
          case "backward" =>
            val c = matches.filter(_._2 <= t)
            if (c.isEmpty) None
            // latest time, tie → max tag (max_by of (rt, tag))
            else Some(c.maxBy(m => (m._2, m._3))._3)
          case "forward" =>
            val c = matches.filter(_._2 >= t)
            if (c.isEmpty) None
            // earliest time, tie → min tag (min_by of (rt, tag))
            else Some(c.minBy(m => (m._2, m._3))._3)
          case _ =>
            if (matches.isEmpty) None
            // smallest |Δt|, tie → smaller rt (backward), then min tag
            else Some(matches.minBy(m =>
              (math.abs(m._2 - t), m._2, m._3))._3)
        }
        (lid, pick)
      }.toSet
    }
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = operators.Joins.asOf(left, right, "k", "rk", "t", "rt",
          tieBreak = Seq("tag"), direction = dir)
        .select("lid", "tag").collect()
        .map(r => (r.getInt(0),
          if (r.isNullAt(1)) None else Some(r.getString(1)))).toSet
      assert(got == reference(dir), s"direction=$dir")
    }
  }

  test("colliding non-key right columns come out suffixed _right") {
    val l = Seq(("k", ts("2001-01-01 00:00:10"), "L"))
      .toDF("k", "t", "src")
    val r = Seq(("k", ts("2001-01-01 00:00:05"), "R"))
      .toDF("rk", "t", "src") // both `t` and `src` collide
    val out = operators.Joins.asOf(l, r, "k", "rk", "t", "t")
    assert(out.columns.sorted.toSeq ==
      Seq("k", "src", "src_right", "t", "t_right"))
    val row = out.select("src", "src_right", "t", "t_right").head()
    assert(row.getString(0) == "L" && row.getString(1) == "R")
    assert(row.getTimestamp(2) == ts("2001-01-01 00:00:10") &&
      row.getTimestamp(3) == ts("2001-01-01 00:00:05"))
  }
}
