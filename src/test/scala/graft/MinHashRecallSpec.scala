package graft

/** Quality evidence for the LSH dedup path: x06's band-collision
  * candidates must recall the overwhelming share of the TRUE high-Jaccard
  * pairs that the exact inverted-index join (x08) finds. Correctness rows
  * prove each query against its own oracle; this spec proves the two
  * AGREE — i.e. the sketch path is a faithful accelerator of the exact
  * path, which is the property that lets a 100 TB pipeline run LSH
  * instead of the exact join.
  */
class MinHashRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("LSH candidates recall >= 90% of exact pairs with jaccard >= 0.5") {
    val exact = SparkEntry.queries("x08_ngram_jaccard")(spark, dir)
      .filter(org.apache.spark.sql.functions.col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val lsh = SparkEntry.queries("x06_dedup_minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(exact.nonEmpty, "corpus has no true near-dup pairs to recall")
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.9,
      f"LSH recall $recall%.2f on ${exact.size} true pairs " +
        s"(missed: ${exact.diff(lsh).take(5)})")
  }
}
