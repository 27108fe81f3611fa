package graft

/** x86_cluster_silhouette: full JVM brute-force replay — recompute every
  * a(i)/b(i)/s(i) from the declared x10 bucket assignment and x41
  * cluster assignment with plain BigInt arithmetic and compare
  * cell-exact, plus the contract invariants (range, singleton/isolated
  * conventions, sign semantics).
  */
class SilhouetteSpec extends SparkSpec {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("x86 equals a JVM brute-force silhouette over the declared " +
    "x10 buckets and x41 clusters") {
    import org.apache.spark.sql.functions._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("qe", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"))
      .select(col("vec_id"), col("qe")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Long]]("qe").toArray).toMap
    val bucket = rows("x10_ann_ivf_assign")
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    val cluster = rows("x41_embed_dedup_clusters")
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    def sq(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // mean in truncating micro-units, exactly the declared spelling
    def micro(ds: Seq[Long]): Long =
      (BigInt(ds.sum) * 1000000 / ds.length).toLong
    val got = rows("x86_cluster_silhouette").map(r =>
      r.getAs[Long]("vec_id") ->
        (Option(r.get(r.fieldIndex("a_micro"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("b_micro"))).map(_.asInstanceOf[Long]),
          r.getAs[Double]("silhouette"))).toMap
    assert(got.keySet == vecs.keySet)
    vecs.keys.foreach { i =>
      val peers = vecs.keys.filter(j => j != i && bucket(j) == bucket(i))
      val own = peers.filter(j => cluster(j) == cluster(i))
        .map(j => sq(vecs(i), vecs(j))).toSeq
      val others = peers.filter(j => cluster(j) != cluster(i))
        .groupBy(cluster).values
        .map(js => micro(js.map(j => sq(vecs(i), vecs(j))).toSeq))
      val ea = if (own.nonEmpty) Some(micro(own)) else None
      val eb = if (others.nonEmpty) Some(others.min) else None
      val es = (ea, eb) match {
        case (Some(a), Some(b)) if math.max(a, b) > 0 =>
          (b - a).toDouble / math.max(a, b).toDouble
        case _ => 0.0
      }
      val (ga, gb, gs) = got(i)
      assert(ga == ea, s"vec $i a_micro: got $ga want $ea")
      assert(gb == eb, s"vec $i b_micro: got $gb want $eb")
      assert(gs == es, s"vec $i silhouette: got $gs want $es")
    }
    // contract: range and sign semantics
    got.values.foreach { case (_, _, s) => assert(s >= -1.0 && s <= 1.0) }
    // the driver data must exercise both defined-score and convention
    // rows, or this spec is vacuous
    assert(got.values.exists { case (a, b, _) => a.isDefined && b.isDefined })
    assert(got.values.exists { case (a, _, s) => a.isEmpty && s == 0.0 })
  }
  test("x86s: serve path over persisted index + clusters equals the " +
    "self-contained x86") {
    def asSeq(name: String) = rows(name).map(_.toSeq).toIndexedSeq
    assert(asSeq("x86s_silhouette_serve") == asSeq("x86_cluster_silhouette"))
  }
}
