package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generative pin for the x57/x58/corpus_curate gram rollup
  * ([[operators.TextQueries.repPerDoc]]): for arbitrary corpora — tiny
  * vocab (worst-case duplicate grams), lengths spanning the n < 2 and
  * n < 3 guard edges — the distributed rollup must equal a brute-force
  * sliding-window recount.
  */
class RepetitionPropSpec extends SparkSpec {

  private val word: Gen[String] = Gen.oneOf(
    "a", "b", "c", "d", "aa", "bb", "cc", "x")

  private val doc: Gen[List[String]] = for {
    n <- Gen.frequency(
      1 -> Gen.const(0), 1 -> Gen.const(1), 2 -> Gen.const(2),
      2 -> Gen.const(3), 10 -> Gen.chooseNum(4, 40))
    ws <- Gen.listOfN(n, word)
  } yield ws

  private def brute(toks: List[String], k: Int): Map[String, Long] =
    toks.sliding(k).filter(_.length == k).map(_.mkString(" "))
      .toSeq.groupBy(identity)
      .map { case (g, o) => g -> o.size.toLong }

  test("repPerDoc equals brute force on arbitrary corpora") {
    import spark.implicits._
    val docs = Gen.listOfN(300, doc).sample.get.zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.toArray) }
    val df = docs.toDF("doc_id", "tk")
      .withColumn("n_tokens", expr("CAST(size(tk) AS BIGINT)"))
    val got = operators.TextQueries.repPerDoc(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val byId = docs.toMap
    // docs with < 2 tokens generate no grams and must be absent
    val expectAbsent = docs.collect { case (id, ws) if ws.length < 2 => id }
    expectAbsent.foreach(id => assert(!got.contains(id)))
    assert(got.size == docs.count(_._2.length >= 2))
    got.foreach { case (id, r) =>
      val toks = byId(id).toList
      val bg = brute(toks, 2)
      assert(r.getAs[Long]("top2") == bg.values.max, s"doc $id top2")
      assert(r.getAs[Long]("tot2") == toks.length - 1, s"doc $id tot2")
      assert(r.getAs[Long]("dst2") == bg.size, s"doc $id dst2")
      if (toks.length >= 3) {
        val tg = brute(toks, 3)
        assert(r.getAs[Long]("top3") == tg.values.max, s"doc $id top3")
        assert(r.getAs[Long]("tot3") == toks.length - 2, s"doc $id tot3")
        assert(r.getAs[Long]("dst3") == tg.size, s"doc $id dst3")
      } else {
        assert(r.isNullAt(r.fieldIndex("top3")), s"doc $id top3 null")
      }
    }
  }
}
