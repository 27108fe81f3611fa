package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Deterministic bounded sample as a native aggregate: keeps the k rows
  * with the smallest `(hv, tag)` per group, carrying one BIGINT payload.
  *
  * The 100 TB shape for "give me a representative sample per group":
  * a window-rank sample shuffles and sorts EVERY row of the group; this
  * aggregate keeps O(k) state, partially aggregates map-side like a sum,
  * and merges by keeping the k smallest of a union — the same KMV
  * monoid as [[KmvSketch]] ("min-k of a union = min-k of merged
  * samples"), here retaining payloads so downstream can compute sample
  * statistics (x54's quantiles, st11's streaming twin) instead of just
  * cardinality.
  *
  * DETERMINISTIC by construction: `hv` is an md5-derived hash computed
  * in plain SQL and `(hv, tag)` is a total order (tag = a unique id),
  * so the retained set never depends on partitioning, arrival order, or
  * merge order — a SQL oracle (min-k via window rank) replays it
  * exactly, and a streaming complete-mode drain equals the batch
  * aggregate.
  *
  * Input: `STRUCT<hv BIGINT, tag BIGINT, val BIGINT>`. Output: the
  * retained rows as `ARRAY<STRUCT<hv, tag, val>>` sorted ascending by
  * `(hv, tag)`. Buffer: a sorted set capped at k; 24 bytes per retained
  * row on the wire.
  */
case class MinKSample(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long, Long)]]
    with UnaryLike[Expression] {

  require(k >= 1, s"mink_sample needs k >= 1, got $k")

  private val ord = implicitly[Ordering[(Long, Long, Long)]]

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StructType(fs)
          if fs.length == 3 && fs.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRUCT<BIGINT, BIGINT, BIGINT>, " +
          s"got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("hv", LongType, nullable = false),
    StructField("tag", LongType, nullable = false),
    StructField("val", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mink_sample"

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long, Long)] =
    new java.util.TreeSet[(Long, Long, Long)](ord)

  private def insert(buf: java.util.TreeSet[(Long, Long, Long)],
      e: (Long, Long, Long)): Unit =
    MinK.insert(buf, e, k, ord.lt)

  override def update(buf: java.util.TreeSet[(Long, Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      // a NULL field (e.g. n_tokens of a NULL text) must not coerce to
      // 0 and enter the sample — skip the row, like the window spelling
      // whose NULLS-last rank never selects it
      if (!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2))
        insert(buf, (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Long, Long)],
      other: java.util.TreeSet[(Long, Long, Long)])
      : java.util.TreeSet[(Long, Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e._1, e._2, e._3))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long, Long)])
      : Array[Byte] = {
    val bb = ByteBuffer.allocate(24 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e._1); bb.putLong(e._2); bb.putLong(e._3)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[(Long, Long, Long)] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining)
      buf.add((bb.getLong(), bb.getLong(), bb.getLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): MinKSample =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MinKSample =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): MinKSample =
    copy(child = newChild)
}
