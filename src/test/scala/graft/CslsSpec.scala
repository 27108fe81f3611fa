package graft

/** x87_csls_rescore: full JVM replay — recompute the bucket-local kNN
  * means and every probe's CSLS ranking from the declared x10 buckets
  * with plain double/BigInt arithmetic, and pin that the correction is
  * non-vacuous on the driver data (some probe's CSLS order differs
  * from its raw-cosine order).
  */
class CslsSpec extends SparkSpec {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("x87 equals a JVM brute-force CSLS over the declared x10 buckets") {
    import org.apache.spark.sql.functions._
    val q = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("qe", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"))
      .select(col("vec_id"), col("qe")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Long]]("qe").toArray).toMap
    val bucket = rows("x10_ann_ivf_assign")
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    def cosMicro(a: Array[Long], b: Array[Long]): Long = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val c = if (na == 0L || nb == 0L) 0.0
        else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
      math.floor(c * 1000000.0 + 0.5).toLong
    }
    val peers = q.keys.map(v =>
      v -> q.keys.filter(w => w != v && bucket(w) == bucket(v)).toSeq).toMap
    // kNN mean in sign-split truncating division, the declared spelling
    val rm = q.keys.filter(peers(_).nonEmpty).map { v =>
      val top = peers(v).map(w => (cosMicro(q(v), q(w)), w))
        .sortBy { case (c, w) => (-c, w) }.take(5).map(_._1)
      val s = top.sum
      v -> (if (s >= 0) s / top.length else -((-s) / top.length))
    }.toMap
    val want = (0L until 8L).filter(peers(_).nonEmpty).flatMap { p =>
      peers(p).map { w =>
        val cm = cosMicro(q(p), q(w))
        (p, w, cm, 2 * cm - rm(p) - rm(w))
      }.sortBy { case (_, w, _, cs) => (-cs, w) }.take(5).zipWithIndex
        .map { case ((p2, w, cm, cs), i) => (p2, i + 1L, w, cm, cs) }
    }.toSet
    val got = rows("x87_csls_rescore").map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("cos_micro"),
        r.getAs[Long]("csls_micro"))).toSet
    assert(got == want)
    // non-vacuity: on some probe the CSLS rank order differs from the
    // raw-cosine order — otherwise the correction isn't exercised
    val byQ = got.groupBy(_._1)
    assert(byQ.values.exists { g =>
      val byCsls = g.toSeq.sortBy(_._2).map(_._3)
      val byCos = g.toSeq.sortBy(t => (-t._4, t._3)).map(_._3)
      byCsls != byCos
    }, "CSLS order equals cosine order on every probe — vacuous data")
  }
  test("x87s: serve path over the persisted IVF assignment equals the " +
    "self-contained x87") {
    def asSeq(name: String) = rows(name).map(_.toSeq).toIndexedSeq
    assert(asSeq("x87s_csls_serve") == asSeq("x87_csls_rescore"))
  }
}
