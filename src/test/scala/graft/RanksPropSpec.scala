package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generative pin for [[operators.Ranks.globalRank]]: for arbitrary
  * duplicate-heavy datasets and arbitrary asc/desc key mixes, the
  * distributed rank must equal a JVM reference sort AND the literal
  * partitionless `row_number` window — including datasets smaller than
  * the partition count (empty range partitions), all-equal value
  * columns (rank decided entirely by the tiebreak), and negative
  * values.
  */
class RanksPropSpec extends SparkSpec {

  // (v1, v2) value pair per id; tiny domains force heavy duplication
  private val row: Gen[(Long, Long)] = for {
    v1 <- Gen.chooseNum(-3L, 3L)
    v2 <- Gen.oneOf(0L, 1L, 7L)
  } yield (v1, v2)

  private val dataset: Gen[List[(Long, Long)]] = for {
    n <- Gen.frequency(1 -> Gen.const(0), 1 -> Gen.const(1),
      2 -> Gen.chooseNum(2, 20), 4 -> Gen.chooseNum(21, 400))
    rs <- Gen.listOfN(n, row)
  } yield rs

  test("globalRank equals a JVM reference sort and the literal window " +
      "on arbitrary data across asc/desc key mixes") {
    import spark.implicits._
    val samples = Gen.listOfN(6, dataset).sample.get
    val keyMixes = Seq(
      (Seq(col("v1"), col("id")),
        Ordering.by((t: (Long, Long, Long)) => (t._2, t._1))),
      (Seq(col("v1").desc, col("v2"), col("id")),
        Ordering.by((t: (Long, Long, Long)) => (-t._2, t._3, t._1))),
      (Seq(col("v2").desc, col("id").desc),
        Ordering.by((t: (Long, Long, Long)) => (-t._3, -t._1))))
    for (rows <- samples; (keys, ord) <- keyMixes) {
      val data = rows.zipWithIndex
        .map { case ((v1, v2), i) => (i.toLong, v1, v2) }
      val df = data.toDF("id", "v1", "v2")
      // JVM reference: full sort under the same total order
      val want = data.sorted(ord).zipWithIndex
        .map { case ((id, _, _), r) => id -> (r + 1L) }.toMap
      val got = Caches.scope(spark)(
        operators.Ranks.globalRank(df, keys, "r")
          .select("id", "r").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap)
      assert(got == want, s"keys=$keys n=${data.size}")
      // and the literal window agrees (engine-level cross-check)
      if (data.nonEmpty) {
        val win = df.withColumn("r",
            row_number().over(Window.orderBy(keys: _*)).cast("long"))
          .select("id", "r").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(win == want, s"window disagrees: keys=$keys")
      }
    }
  }
}
