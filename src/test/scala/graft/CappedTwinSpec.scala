package graft

import org.apache.spark.sql.functions._

/** Semantics pins for the declared capped-twin queries that the DuckDB
  * oracle alone cannot express: the capped result must relate to the
  * exact result the way the cap contract promises (subset of pairs /
  * never-higher similarity), not merely match its own capped oracle.
  */
class CappedTwinSpec extends SparkSpec {

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("x06c candidate pairs are a subset of the exact x06 pairs") {
    val exact = pairs("x06_dedup_minhash_lsh")
    val capped = pairs("x06c_lsh_bandcap")
    assert(capped.nonEmpty, "cap must not empty the candidate set here")
    assert(capped.subsetOf(exact),
      "dropping hot bands can only REMOVE candidates")
    assert(capped != exact, "the cap is chosen to bite on this data")
  }

  test("x11c near-dup pairs are a subset of the exact x11 pairs") {
    def vp(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sf)
        .select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = vp("x11_embed_neardup")
    val capped = vp("x11c_neardup_bucketcap")
    assert(capped.nonEmpty)
    assert(capped.subsetOf(exact),
      "capping bucket participation can only REMOVE pairs")
    assert(capped != exact, "the cap is chosen to bite on this data")
  }

  test("x08c jaccard is never higher than exact x08 jaccard per pair") {
    def jm(name: String): Map[(Long, Long), Double] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = jm("x08_ngram_jaccard")
    val capped = jm("x08c_jaccard_dfcap")
    assert(capped.nonEmpty)
    capped.foreach { case (k, v) =>
      // dropped shingles stop voting in |A∩B| while sizes stay full, so
      // capped jaccard underestimates; a capped pair above the report
      // floor must exist in the exact result with jaccard >= capped
      assert(exact.contains(k), s"pair $k vanished from the exact set")
      assert(v <= exact(k) + 1e-12, s"pair $k capped=$v exact=${exact(k)}")
    }
  }
}
