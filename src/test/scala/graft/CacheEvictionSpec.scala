package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Eviction pin for the `Caches.scoped` persists behind
  * `Ranks.globalRank`: correctness depends on the offsets branch and
  * the output branch reading ONE stamped pid/mono assignment, argued
  * safe under storage pressure because MEMORY_AND_DISK spills evicted
  * blocks to disk (no recompute) and a lost-block recompute re-derives
  * identical stamps (range-bound sampling is seeded per RDD id). This
  * spec replaces the prose with a measurement on a context whose
  * unified pool is squeezed to ~22 MB (`spark.testing.memory` +
  * `spark.memory.fraction`):
  *
  *   1. `globalRank` over a generated 2M-row key permutation — the
  *      stamped persist (~80 MB deserialized) CANNOT fit, so blocks
  *      provably evict (asserted via storage status) while the two
  *      branches read it, and every rank is still exactly key+1
  *      (closed form, verified distributedly);
  *   2. e12/o15 (whose own stamped frames are small at any test SF)
  *      re-run under the same pressure — heavy shuffle spill — and
  *      must match the unsqueezed rows bit-for-bit.
  *
  * The suite swaps the JVM's shared session for the squeezed one and
  * stops it afterwards — safe because build.sbt runs suites
  * sequentially; the next suite's getOrCreate builds a fresh default.
  */
class CacheEvictionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.1"
  private val names = Seq("e12_rfm_segments", "o15_zorder_key")

  test("globalRank's stamped persist evicts to disk under a squeezed " +
      "pool and every rank stays exact; e12/o15 rows stay bit-identical") {
    // baseline rows from the normally-sized shared session
    val want = names.map { n =>
      val rows = SparkEntry.queries(n)(spark, dir)
        .collect().map(_.toSeq.toList).toSeq
      spark.catalog.clearCache()
      n -> rows
    }.toMap
    spark.stop()
    // (450 MB testing memory − 300 MB reserved) × 0.15 ≈ 22 MB unified
    // pool, storage protected region ~2.2 MB: the ~80 MB stamped frame
    // STILL cannot fit (eviction stays guaranteed and is asserted
    // below), but execution pages keep ~2× headroom — at 0.08 the pool
    // sat at the HashAggregate initial-page boundary and one unlucky
    // in-task consumer layout tipped a partial agg into
    // UNABLE_TO_ACQUIRE_MEMORY (observed ~1-in-3 suite runs)
    val squeezed = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.testing.memory", "471859200") // Spark's floor (1.5x reserved)
      .config("spark.memory.fraction", "0.15")
      .config("spark.memory.storageFraction", "0.1")
      .getOrCreate()
    try {
      // 1. the eviction stress: keys are the permutation
      //    k = id * 2654435761 mod 2^6*3*5^6 (multiplier coprime to n),
      //    so the global rank of the row with key k must be exactly
      //    k + 1 — verifiable without collecting 2M rows
      val n = 2000000L
      val df = squeezed.range(n)
        .select((col("id") * lit(2654435761L) % lit(n)).as("k"),
          col("id").as("payload"))
      // no Caches.scope open: the scoped persist inside globalRank
      // degrades to a bare persist and SURVIVES the action, so storage
      // status below reflects where the blocks actually live
      val bad = operators.Ranks.globalRank(df, Seq(col("k")), "rank")
        .filter(col("rank") =!= col("k") + lit(1L)).count()
      val info = squeezed.sparkContext.getRDDStorageInfo
      assert(info.exists(_.diskSize > 0),
        s"no eviction observed (storage: ${info.toSeq.map(i =>
          s"mem=${i.memSize} disk=${i.diskSize}")}) — " +
          "squeeze harder or grow the input")
      assert(bad == 0L, s"$bad ranks drifted under eviction")
      squeezed.catalog.clearCache()
      // 2. the registry rows under the same pressure
      for (name <- names) {
        val got = SparkEntry.queries(name)(squeezed, dir)
          .collect().map(_.toSeq.toList).toSeq
        assert(got == want(name), s"$name drifted under memory pressure")
        squeezed.catalog.clearCache()
      }
    } finally squeezed.stop()
  }
}
