package graft

import java.nio.file.Files

/** x88_ivf_append: the append-without-retrain contract.
  *
  * Fixture: 8 OLD vectors with pairwise-distinct directions (self-cosine
  * strictly dominates every cross-cosine), then 8 NEW vectors that are
  * exact copies of the old ones. With n = 16 the old half is exactly the
  * 8 distinct vectors; the 64-centroid floor makes every old vector its
  * own centroid and Lloyd a fixpoint — so the expected assignment needs
  * no Lloyd replay: old vector i sits alone in bucket i, and new copy
  * 8+i must land in bucket i via the frozen-centroid argmax. Every
  * bucket therefore reads (n_old = 1, n_new = 1, share_new_pct = 50) —
  * any retraining, any midpoint drift, or any cross-engine tie-break
  * skew breaks the pattern.
  */
class IvfAppendSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-ivfappend").toFile
    d.deleteOnExit()
    val dirs = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f),
      Array(1f, 1f, 0f, 0f), Array(0f, 0f, 1f, 1f),
      Array(1f, 0f, 1f, 0f), Array(0f, 1f, 0f, 1f))
    ((0 until 8).map(i => (i.toLong, dirs(i), 0)) ++
      (0 until 8).map(i => (8L + i, dirs(i), 1)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d.toString
  }

  test("new copies assign to their old twin's bucket; audit reads 1/1/50") {
    val rows = SparkEntry.queries("x88_ivf_append")(spark, dir).collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(0)).toSeq == (0L until 8L))
    rows.foreach { r =>
      assert(r.getLong(1) == 1L, s"bucket ${r.getLong(0)} n_old")
      assert(r.getLong(2) == 1L, s"bucket ${r.getLong(0)} n_new")
      assert(r.getLong(3) == 50L, s"bucket ${r.getLong(0)} share")
    }
  }

  test("on the driver corpus the halves partition the vector count") {
    val rows = SparkEntry.queries("x88_ivf_append")(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == n / 2)
    assert(rows.map(_.getLong(2)).sum == n - n / 2)
    // non-vacuity: appended mass is spread over more than one bucket
    assert(rows.count(_.getLong(2) > 0) > 1)
  }
}
