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

  override def update(buf: java.util.TreeSet[Long],
      input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // the estimator is only meaningful for hashes uniform on
      // [0, 2^60) — the md5-conv spelling every caller uses. A signed
      // hash (xxhash64 is negative half the time) would make buf.last
      // negative and the "distinct count" negative or Infinity; fail
      // LOUDLY at the offending row instead of propagating garbage.
      require(h >= 0L && h < (1L << 60),
        s"kmv_sketch expects 60-bit non-negative hashes " +
          s"(the md5-conv spelling, e.g. conv(substr(md5(x),1,15),16,10))" +
          s"; got $h — xxhash64 and other signed hashes violate the " +
          s"estimator's [0, 2^60) uniformity")
      MinK.insert(buf, h, k, (a: Long, b: Long) => a < b)
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[Long],
      other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext)
      MinK.insert(buf, it.next(), k, (a: Long, b: Long) => a < b)
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

/** The capped min-k TreeSet insert shared by [[KmvSketch]] and
  * [[MinKSample]] — ONE definition of the subtle invariant: insertion
  * only happens when `e < last`, so the add-then-evict-last ordering can
  * never evict the element just added (and a duplicate add returning
  * false must not evict at all).
  */
private[functions] object MinK {
  def insert[T](buf: java.util.TreeSet[T], e: T, k: Int,
      lt: (T, T) => Boolean): Unit =
    if (buf.size < k) { buf.add(e); () }
    else if (lt(e, buf.last)) {
      if (buf.add(e)) { buf.remove(buf.last); () }
    }
}
