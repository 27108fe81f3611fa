package graft

import org.apache.spark.sql.functions._

import graft.operators.SrpQueries

/** Pins for the SRP (hyperplane) LSH family that the DuckDB oracle alone
  * cannot express: the key derivation replayed in exact JVM integer
  * arithmetic, the zero-vector all-ones-key convention, multiprobe
  * retrieval of exact duplicates, the capped twin's subset contract, and
  * the recall audit's arithmetic invariants.
  */
class SrpSpec extends SparkSpec {
  import spark.implicits._

  private val Dims = 64
  private val Bands = 8
  private val BitsPerBand = 8

  /** The closed-form hyperplane weight — the JVM twin of the SQL
    * `((h+1)*2654435761 + i*40503) % 2039 - 1019` (all operands positive
    * before the mod, so `%` agrees across JVM/Spark/DuckDB).
    */
  private def weight(h: Int, i: Int): Long =
    (((h + 1).toLong * 2654435761L + i.toLong * 40503L) % 2039L) - 1019L

  private def jvmKeys(qe: Array[Long]): Seq[Long] =
    (0 until Bands).map { b =>
      (0 until BitsPerBand).map { r =>
        val h = b * BitsPerBand + r
        val dot = (1 to Dims).map(i => qe(i - 1) * weight(h, i)).sum
        if (dot >= 0) 1L << r else 0L
      }.sum
    }

  /** Tiny quantized corpus fed straight to the internals: a zero vector,
    * an exact-duplicate pair (1, 2), a constant vector, a one-hot, and a
    * reversed ramp — the EdgeEmbeddingsSpec cast in integer milli-units.
    */
  private def fixture = {
    def vec(f: Int => Long): Array[Long] = Array.tabulate(Dims)(f)
    Seq(
      (0L, vec(_ => 0L)),
      (1L, vec(i => i * 1000L / Dims)),
      (2L, vec(i => i * 1000L / Dims)),
      (3L, vec(_ => 1000L)),
      (4L, vec(i => if (i == 0) 1000L else 0L)),
      (5L, vec(i => (Dims - i) * 1000L / Dims)))
      .toDF("vec_id", "qe")
      .withColumn("qn", expr(
        "aggregate(qe, CAST(0 AS BIGINT), (acc, v) -> acc + v * v)"))
  }

  test("band keys replay bit-for-bit in exact JVM integer arithmetic") {
    def vec(f: Int => Long): Array[Long] = Array.tabulate(Dims)(f)
    val vecs = Map(
      0L -> vec(_ => 0L), 1L -> vec(i => i * 1000L / Dims),
      3L -> vec(_ => 1000L), 4L -> vec(i => if (i == 0) 1000L else 0L),
      5L -> vec(i => (Dims - i) * 1000L / Dims))
    val got = SrpQueries.bandKeys(fixture)
      .select("vec_id", "band", "bkey").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.size == 6 * Bands)
    for ((v, qe) <- vecs; (k, b) <- jvmKeys(qe).zipWithIndex)
      assert(got((v, b)) == k, s"vec $v band $b: spark=${got((v, b))} jvm=$k")
  }

  test("the zero vector hashes to the all-ones key in every band " +
    "(dt = 0 packs as bit 1 — the hot-bucket case bandCap exists for)") {
    val zero = SrpQueries.bandKeys(fixture)
      .filter(col("vec_id") === 0L).select("bkey").collect()
    assert(zero.length == Bands)
    assert(zero.forall(_.getLong(0) == (1L << BitsPerBand) - 1),
      zero.map(_.getLong(0)).toSeq.toString)
  }

  test("exact duplicates share every band key and retrieve each other at " +
    "rank 1 with n_bands = Bands") {
    val keys = SrpQueries.bandKeys(fixture)
      .select("vec_id", "band", "bkey").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (b <- 0 until Bands)
      assert(keys((1L, b)) == keys((2L, b)), s"band $b keys differ")
    val top = SrpQueries.srpTopK(fixture).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("n_bands")))
    assert(top.exists(t => t._1 == 1L && t._2 == 1L && t._3 == 2L
      && t._4 == Bands.toLong), top.toSeq.toString)
    assert(top.exists(t => t._1 == 2L && t._2 == 1L && t._3 == 1L
      && t._4 == Bands.toLong), top.toSeq.toString)
    assert(top.forall(t => t._4 >= 1 && t._4 <= Bands.toLong),
      "a candidate's key matches at most one probe key per band")
  }

  test("every neighbor the zero-vector probe retrieves scores cos = 0 " +
    "(the shared zero-norm guard, not IEEE NaN)") {
    val rows = SrpQueries.srpTopK(fixture)
      .filter(col("q_id") === 0L).select("cos").collect()
    assert(rows.forall(_.getDouble(0) == 0.0d), rows.toSeq.toString)
  }

  test("x89c candidates are a subset of x89's with n_bands never higher " +
    "(capping a band bucket can only remove evidence), and the cap bites") {
    def byPair(name: String): Map[(Long, Long), Long] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))
          -> r.getAs[Long]("n_bands")).toMap
    val exact = byPair("x89_srp_lsh_ann")
    val capped = byPair("x89c_srp_bandcap")
    spark.catalog.clearCache()
    assert(capped.nonEmpty, "cap must not empty the retrieval here")
    assert(exact != capped, "the cap is chosen to bite on this data")
    // top-K re-ranking means capped rows need not be exact top-K rows,
    // but any pair BOTH retain must have lost evidence monotonically
    capped.keySet.intersect(exact.keySet).foreach { k =>
      assert(capped(k) <= exact(k), s"pair $k gained bands under the cap")
    }
  }

  test("recall audit invariants: possible = n_probes * K, 0 <= hits <= " +
    "possible, recall = hits / possible exactly") {
    val r = SparkEntry.queries("x90_srp_recall")(spark, sf).collect().head
    spark.catalog.clearCache()
    val (np, k, poss, hits, rec) = (r.getAs[Long]("n_probes"),
      r.getAs[Long]("k"), r.getAs[Long]("possible"),
      r.getAs[Long]("hits"), r.getAs[Double]("recall"))
    assert(poss == np * k, s"possible=$poss != $np*$k")
    assert(hits >= 0 && hits <= poss)
    assert(rec == hits.toDouble / poss.toDouble)
  }
}
