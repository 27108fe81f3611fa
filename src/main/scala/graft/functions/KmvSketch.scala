package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native aggregate.
  *
  * The 100 TB shape for approximate COUNT(DISTINCT): exact distinct needs
  * a shuffle of every distinct key; a KMV sketch keeps only the K
  * smallest hash values per group — O(K) state, mergeable by keeping the
  * K smallest of a union — so partial aggregation works map-side like any
  * sum. Estimator (Bar-Yossef et al., public): with hashes uniform on
  * [0, 2^60), `distinct ≈ (K-1) * 2^60 / h_K` where `h_K` is the K-th
  * smallest distinct hash; if fewer than K distinct hashes were seen the
  * count is exact.
  *
  * DETERMINISTIC by construction, unlike `approx_count_distinct` (whose
  * HLL++ is engine-specific): the input is an md5-derived 60-bit hash
  * computed in plain SQL, and the K-th smallest of a set doesn't depend
  * on partitioning or merge order — so a SQL oracle (min-K via window
  * rank) replays the estimate bit-for-bit. The division is spelled
  * `((K-1) * 2^60) / h_K` in double on both engines: one exactly-
  * representable product, one correctly-rounded divide.
  *
  * Buffer: a sorted long array, capped at K. Serialized as 8 bytes per
  * retained hash.
  */
case class KmvSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]]
    with UnaryLike[Expression] {

  require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

  private val TwoPow60 = 1.152921504606846976e18 // exact double

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT hash column, got ${other.sql}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def insert(buf: java.util.TreeSet[Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      if (buf.add(h)) { buf.remove(buf.last); () }
    }

  override def update(buf: java.util.TreeSet[Long],
      input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[Long],
      other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else ((k - 1).toDouble * TwoPow60) / buf.last.toDouble

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val buf = new java.util.TreeSet[Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): KmvSketch =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KmvSketch =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}
