package graft

import org.apache.spark.sql.functions._

/** The x08 `dfCap` skew lever on a degenerate corpus: every document
  * shares one boilerplate shingle; each true near-dup pair additionally
  * shares rare shingles. The cap must drop the hot shingle's votes
  * (killing pairs supported ONLY by boilerplate, lowering jaccard for the
  * rest) and must never invent pairs the exact join lacks.
  */
class NgramJaccardCapSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("x08cap").toString
    // "common common common" is the hot shingle (df = all 6 docs);
    // docs 0/1 and 2/3 are near-dups through distinct rare shingles;
    // docs 4/5 overlap ONLY in the boilerplate.
    val mk = (id: Long, rare: String) =>
      (id, s"common common common $rare", "en", "synthetic",
        (s"common common common $rare").length.toLong)
    import spark.implicits._
    Seq(
      mk(0L, "alpha beta gamma delta"), mk(1L, "alpha beta gamma epsilon"),
      mk(2L, "zeta eta theta iota"), mk(3L, "zeta eta theta kappa"),
      mk(4L, "mu nu xi omicron"), mk(5L, "pi rho sigma tau"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def pairs(dfCap: Option[Int]): Map[(Long, Long), Double] =
    operators.DedupQueries.ngramJaccard(spark, dir, dfCap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("dfCap drops boilerplate-only pairs and never adds pairs") {
    val exact = pairs(None)
    val capped = pairs(Some(3)) // hot shingle df=6 > 3; rare shingles df<=2
    // the boilerplate-only pair exists exactly, dies under the cap
    assert(exact.contains((4L, 5L)))
    assert(!capped.contains((4L, 5L)))
    // capped results are a subset with jaccard <= the exact value
    assert(capped.keySet.subsetOf(exact.keySet))
    capped.foreach { case (k, j) => assert(j <= exact(k) + 1e-12, k) }
    // true near-dups survive the cap
    assert(capped.contains((0L, 1L)) && capped.contains((2L, 3L)))
    spark.catalog.clearCache()
  }

  test("dfCap high enough to keep every shingle is the identity") {
    assert(pairs(Some(100)) == pairs(None))
    spark.catalog.clearCache()
  }
}
