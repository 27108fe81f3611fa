package graft

import org.apache.spark.sql.functions._

/** x77's exact Mann-Whitney core (TextQueries.aucBySlice) against the
  * O(n²) pair-counting definition: AUC = (#concordant + ½·#tied) /
  * (n_pos·n_neg), on random tied-heavy inputs.
  */
class AucSpec extends SparkSpec {

  private def bruteAuc(rows: Seq[(Long, Long)]): Option[Double] = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      var num2 = 0L // 2*(concordant + 0.5*tied)
      for (p <- pos; n <- neg) {
        if (p > n) num2 += 2
        else if (p == n) num2 += 1
      }
      Some(num2.toDouble / (2.0 * pos.length * neg.length))
    }
  }

  test("aucBySlice matches pair counting on tied-heavy random slices") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // few distinct scores => heavy ties, the case mid-ranks must get right
    val data = for {
      slice <- Seq("a", "b", "c")
      _ <- 1 to 200
    } yield (slice, rnd.nextInt(6).toLong, rnd.nextInt(2).toLong)
    val df = data.toDF("slice", "score", "pos")
    val got = operators.TextQueries
      .aucBySlice(df, "slice", "score", "pos")
      .select(col("slice"), col("auc"))
      .as[(String, Option[Double])].collect().toMap
    for (s <- Seq("a", "b", "c")) {
      val expect = bruteAuc(
        data.filter(_._1 == s).map(t => (t._2, t._3)))
      assert(got(s).isDefined === expect.isDefined, s"slice $s definedness")
      for (e <- expect; g <- got(s))
        assert(math.abs(g - e) < 1e-12, s"slice $s: got $g expect $e")
    }
  }

  test("single-class slice yields NULL auc") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("b", 1L, 0L))
      .toDF("slice", "score", "pos")
    val got = operators.TextQueries
      .aucBySlice(df, "slice", "score", "pos")
      .select(col("slice"), col("auc"))
      .as[(String, Option[Double])].collect().toMap
    assert(got("a").isEmpty && got("b").isEmpty)
  }
}
