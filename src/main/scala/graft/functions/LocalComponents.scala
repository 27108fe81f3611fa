package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Connected components of ONE small edge list, solved locally:
  * `local_components(ARRAY<STRUCT<a BIGINT, b BIGINT>>)` returns
  * `ARRAY<STRUCT<id BIGINT, comp BIGINT>>` — one entry per distinct
  * endpoint, `comp` = the minimum vertex id reachable from `id`
  * (identical labeling to [[graft.operators.Components]]' fixpoint).
  *
  * This is the bucket-local half of a hierarchical CC design: when a
  * candidate-pair generator guarantees every edge lives inside one
  * partition key (the IVF bucket join in SimilarityQueries — pairs
  * never cross buckets), components can be solved per key in a single
  * `collect_list` aggregation instead of a global BSP loop — one
  * key-partitioned shuffle replaces 4-12 iterative rounds of join +
  * checkpoint + convergence probe. The per-key edge list is bounded by
  * the caller's bucket-size contract (the √n centroid budget and the
  * `bucketCap` lever), so the local solve is O(bucket·α(bucket)) with
  * union-find — never corpus-proportional. Graphs whose edges DO cross
  * partition keys (the LSH band graph of x14) must keep the global BSP
  * loop.
  *
  * Union-find with path halving + union-by-size; output sorted by `id`
  * so the result is deterministic regardless of edge order. Evaluated
  * once per GROUP (not per corpus row), so interpreted eval
  * (CodegenFallback) costs nothing measurable next to the aggregation
  * that feeds it. NULL edge entries and NULL endpoints are ignored.
  */
case class LocalComponents(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 2 &&
            fields.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRUCT<BIGINT, BIGINT>>, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("comp", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "local_components"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val index = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
    val ids = new scala.collection.mutable.ArrayBuffer[Long]()
    var parent = new Array[Int](math.max(8, 2 * n))
    var size = new Array[Int](parent.length)
    def ensure(cap: Int): Unit = if (cap > parent.length) {
      parent = java.util.Arrays.copyOf(parent, math.max(cap, 2 * parent.length))
      size = java.util.Arrays.copyOf(size, parent.length)
    }
    def idOf(v: Long): Int = {
      val got = index.get(v)
      if (got != null) got.intValue()
      else {
        val i = ids.length
        index.put(v, i)
        ids += v
        ensure(i + 1)
        parent(i) = i
        size(i) = 1
        i
      }
    }
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) {
        parent(x) = parent(parent(x)) // path halving
        x = parent(x)
      }
      x
    }
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        val st = arr.getStruct(e, 2)
        if (!st.isNullAt(0) && !st.isNullAt(1)) {
          val ra = find(idOf(st.getLong(0)))
          val rb = find(idOf(st.getLong(1)))
          if (ra != rb) {
            if (size(ra) >= size(rb)) { parent(rb) = ra; size(ra) += size(rb) }
            else { parent(ra) = rb; size(rb) += size(ra) }
          }
        }
      }
      e += 1
    }
    val m = ids.length
    // min vertex id per root = the component label
    val minOf = new Array[Long](m)
    java.util.Arrays.fill(minOf, Long.MaxValue)
    var i = 0
    while (i < m) {
      val r = find(i)
      if (ids(i) < minOf(r)) minOf(r) = ids(i)
      i += 1
    }
    val order = (0 until m).sortBy(ids(_))
    val out = new Array[Any](m)
    var k = 0
    while (k < m) {
      val i2 = order(k)
      out(k) = new GenericInternalRow(
        Array[Any](ids(i2), minOf(find(i2))))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LocalComponents = copy(child = newChild)
}
