package graft

import org.apache.spark.sql.functions._

/** Semantics pins for the layout/compression operators: the o15 Morton
  * interleave must be the textbook bit-interleave (locality is the whole
  * point of the key), and the x28 int8 quantizer must be invertible to
  * within one quantization step (otherwise it isn't a codec).
  */
class LayoutQuantizeSpec extends SparkSpec {

  test("o15: zkey is the exact rank-space bit-interleave") {
    // interleave(x, y) places x's bit i at 2i and y's bit i at 2i+1,
    // where x/y are the 16-bit-scaled ranks of custkey/orderkey
    val rows = SparkEntry.queries("o15_zorder_key")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def morton(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val n = rows.length.toLong
    val rx = rows.map(r => (r._1, r._2)).sortBy(t => (t._2, t._1))
      .zipWithIndex.map { case ((ok, _), i) => ok -> i.toLong }.toMap
    val ry = rows.map(_._1).sorted.zipWithIndex
      .map { case (ok, i) => ok -> i.toLong }.toMap
    rows.foreach { case (okey, ckey, z) =>
      val expected = morton(rx(okey) * 65536 / n, ry(okey) * 65536 / n)
      assert(z == expected, s"order $okey cust $ckey: got $z")
    }
  }

  test("o15: z-sorted layout clusters both dimensions (skipping works)") {
    // chunk the z-sorted keys into 'files'; a dimension predicate must
    // prune most chunks via min/max alone — the property a plain
    // single-column sort only gives ONE dimension. Statistical, but the
    // corpus and chunking are deterministic so the numbers are stable.
    val rows = SparkEntry.queries("o15_zorder_key")(spark, sf)
      .select("o_custkey", "o_orderkey", "zkey")
      .collect().map(r => (r.getLong(0) % 65536, r.getLong(1) % 65536,
        r.getLong(2)))
    def survivors(data: Seq[(Long, Long, Long)],
        sort: ((Long, Long, Long)) => Long,
        dim: ((Long, Long, Long)) => Long): (Int, Int) = {
      val chunks = data.sortBy(sort).grouped(100).toSeq
      val hi = data.map(dim).max / 16 // a 1/16-wide slice from the origin
      (chunks.count(c => dim(c.minBy(dim)) <= hi), chunks.size)
    }
    // z-sorted files prune on BOTH dims; the single-column (orderkey)
    // sort is the control: it gives custkey predicates ~no pruning
    val (zx, n) = survivors(rows, _._3, _._1)
    val (zy, _) = survivors(rows, _._3, _._2)
    val (cx, _) = survivors(rows, _._2, _._1) // orderkey-sorted control
    assert(zx <= n / 2, s"z-layout cust-dim survivors $zx/$n")
    assert(zy <= n / 2, s"z-layout order-dim survivors $zy/$n")
    assert(zx < cx, s"z-layout ($zx) must beat orderkey-sort ($cx) on custkey")
  }

  test("x28: quantization inverts to within one step per component") {
    val q = SparkEntry.queries("x28_embed_quantize")(spark, sf)
      .select("vec_id", "vmin", "vmax")
    val joined = Tables.embeddings(spark, sf).join(q, "vec_id")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("step",
        expr("CASE WHEN vmax > vmin THEN (vmax - vmin) / 255.0 ELSE 0D END"))
      .withColumn("maxerr", expr(
        """array_max(transform(v, x -> abs(x - (vmin +
           CASE WHEN vmax > vmin
             THEN floor((x - vmin) * 255.0 / (vmax - vmin)) *
               ((vmax - vmin) / 255.0)
             ELSE 0D END))))"""))
      .select(max(expr("maxerr - step")).as("worst"))
      .head()
    // reconstruction error never exceeds one quantization step
    assert(joined.getDouble(0) <= 1e-12, joined.toString)
  }
}
