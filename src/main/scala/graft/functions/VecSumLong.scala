package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of `ARRAY<BIGINT>` columns as a native aggregate —
  * the Lloyd-update kernel shared by the IVF centroid trainer
  * ([[graft.operators.SimilarityQueries]]) and the PQ codebook trainer
  * ([[graft.operators.PqQueries]]).
  *
  * The pre-r13 spelling was a typed `groupByKey/mapValues/reduceGroups`
  * fold: correct, map-side partial-aggregating, but it pays a
  * Catalyst→JVM array decode and re-encode PER ROW
  * (DeserializeToObject/SerializeFromObject around the object hash
  * aggregate). This aggregate keeps the same (vector-sum, implicit
  * count via a sibling `count(1)`) monoid with one primitive long-array
  * buffer per GROUP: updates add in place off the ArrayData, merges add
  * buffers, and the exchange carries one serialized array per
  * (group, partition) exactly like the typed fold — minus the per-row
  * ser/de (guide §4: built-in-style aggregation in the hot path).
  * Dimension-agnostic: the buffer sizes itself to the first row's
  * length (the typed fold's `a._1.length` behavior), so spec fixtures
  * with short vectors work unchanged.
  *
  * Semantics: int64 sums — associative, order-independent, exact, and
  * OVERFLOW THROWS (Math.addExact → ArithmeticException) where the
  * typed fold it replaced wrapped silently with plain Long `+` — the
  * one behavior difference vs that fold (r13 ADVICE), deliberate: a
  * wrapped component sum would walk the trainer to garbage centroids
  * quietly. NULL arrays are skipped (like sum's null handling; the
  * engine's quantized frames are non-null). A NULL ELEMENT or a length
  * mismatch within one group fails loudly (IllegalArgumentException) —
  * the typed fold crashed on mismatch too, and silently zero-filling
  * would corrupt a centroid. Empty input yields NULL (sum's
  * convention).
  */
case class VecSumLong(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an ARRAY<BIGINT> column, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum_long"

  // null = "no rows seen yet" (an empty group evals to NULL, matching
  // sum); the buffer allocates lazily at the first row's length
  override def createAggregationBuffer(): Array[Long] = null

  private def addInto(buf: Array[Long], arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val out = if (buf == null) new Array[Long](n) else buf
    require(out.length == n,
      s"$prettyName: array length mismatch within one group " +
        s"(${out.length} vs $n)")
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i),
        s"$prettyName: NULL element at position $i")
      out(i) = Math.addExact(out(i), arr.getLong(i))
      i += 1
    }
    out
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else addInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other == null) buf
    else if (buf == null) other
    else {
      require(buf.length == other.length,
        s"$prettyName: array length mismatch within one group " +
          s"(${buf.length} vs ${other.length})")
      var i = 0
      while (i < buf.length) {
        buf(i) = Math.addExact(buf(i), other(i)); i += 1
      }
      buf
    }

  override def eval(buf: Array[Long]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    if (buf == null) Array.emptyByteArray
    else {
      val bb = ByteBuffer.allocate(8 * buf.length)
      var i = 0
      while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    if (bytes.isEmpty) null
    else {
      val bb = ByteBuffer.wrap(bytes)
      val out = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < out.length) { out(i) = bb.getLong(); i += 1 }
      out
    }

  override def withNewMutableAggBufferOffset(off: Int): VecSumLong =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): VecSumLong =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(newChild: Expression): VecSumLong =
    copy(child = newChild)
}
