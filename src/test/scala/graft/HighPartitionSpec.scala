package graft

/** Cluster-width pin: the whole perf story is measured at
  * `spark.sql.shuffle.partitions` = 4-32, but a real cluster runs
  * 1000-4000. The partition-count-sensitive machinery — the
  * `Ranks.globalRank` range exchange + triangular offset join (P²
  * broadcast pairs, but P = CLUSTER width, so 2048² = 4.2M trivial
  * pairs), the contracted-BSP connected-components rounds, and the
  * banded LSH join — must produce bit-identical rows at 2048 shuffle
  * partitions, including the degenerate P ≫ n regime where most range
  * partitions are EMPTY (at this SF, 2048 partitions over hundreds of
  * rows — empty partitions stress the mono-id base/offset bookkeeping
  * far harder than a balanced layout).
  */
class HighPartitionSpec extends SparkSpec {

  private lazy val hi = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "2048")
    s
  }

  private def rows(s: org.apache.spark.sql.SparkSession, name: String,
      dir: String): Seq[Seq[Any]] = {
    val out = SparkEntry.queries(name)(s, dir)
      .collect().map(_.toSeq.toList).toSeq
    s.catalog.clearCache()
    out
  }

  private def pin(name: String, dir: String = sf): Unit = {
    val base = rows(spark, name, dir)
    val wide = rows(hi, name, dir)
    assert(wide == base,
      s"$name drifted at 2048 shuffle partitions (" +
        s"${wide.length} vs ${base.length} rows)")
  }

  test("globalRank family (e12 quartiles, o15 rank stage) is " +
      "bit-identical at 2048 shuffle partitions, P >> n") {
    pin("e12_rfm_segments")
    pin("o15_zorder_key")
  }

  test("e12 also holds at sf0.01 (non-degenerate rows-per-partition)") {
    pin("e12_rfm_segments", "/root/testdata/sf0.01")
  }

  test("contracted-BSP connected components (x14 clusters, x42 " +
      "canonicals) are bit-identical at 2048 shuffle partitions") {
    pin("x14_dedup_clusters")
    pin("x42_cluster_canonical")
  }

  test("banded MinHash LSH join (x06) is bit-identical at 2048 " +
      "shuffle partitions") {
    pin("x06_dedup_minhash_lsh")
  }

  test("x73's packed-cell fold (sum_weighted_entries partial/merge) " +
      "is bit-identical at 2048 shuffle partitions") {
    // tiny per-partition groups exercise the ObjectHashAggregate
    // partial path + serialize/merge across the widest exchange
    pin("x73_source_attribution")
  }
}
