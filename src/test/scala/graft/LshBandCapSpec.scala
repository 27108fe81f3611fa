package graft

import graft.operators.DedupQueries

/** The MinHash-LSH `bandCap` skew lever (x06/x14's twin of x08's
  * `dfCap`) on a degenerate signature set: one band bucket shared by
  * every document — the adversarial hot key whose fan-out is quadratic
  * in the bucket size. The cap must drop that bucket's pairs (keeping
  * pairs supported by any surviving band) and must never invent pairs
  * the exact join lacks.
  */
class LshBandCapSpec extends SparkSpec {

  import spark.implicits._

  // sig0 = 99 for all ten docs (the hot band bucket); docs 0 and 1 also
  // collide on sig1 = 7; every other signature is unique per doc
  private lazy val sigs = (0L until 10L).map { id =>
    (id, 99L, if (id <= 1L) 7L else 100L + id,
      200L + id, 300L + id, 400L + id, 500L + id)
  }.toDF("doc_id", "sig0", "sig1", "sig2", "sig3", "sig4", "sig5")

  test("uncapped: the hot band emits all quadratic pairs") {
    val pairs = DedupQueries.lshCandidates(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size == 45) // C(10,2) through the shared band
    assert(pairs.contains((0L, 1L)))
  }

  test("bandCap drops the hot bucket, keeps rare-band pairs") {
    val pairs = DedupQueries.lshCandidates(sigs, bandCap = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the sig1-collision survives; the 45 boilerplate pairs are gone
    assert(pairs == Set((0L, 1L)))
  }

  test("capped candidates are a subset of the exact join's") {
    val exact = DedupQueries.lshCandidates(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = DedupQueries.lshCandidates(sigs, bandCap = Some(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(exact))
    assert(capped.isEmpty) // cap=1 drops every bucket with a collision
  }
}
