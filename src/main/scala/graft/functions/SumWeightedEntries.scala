package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-group keyed weighted sum: folds rows of
  * `(entries: ARRAY<STRUCT<src: STRING, dlp: BIGINT>>, w: BIGINT)` into one
  * `MAP<STRING, BIGINT>` accumulating `Σ w·dlp` per `src`.
  *
  * The scale shape this exists for (x73 source attribution): scoring a
  * document against S per-source LMs via a token-keyed join used to fan
  * out S rows per (doc, token) — an S× multiplier on the aggregation
  * input and an S× multiplier on the map-side hash-aggregation key space
  * ((doc, src) keys instead of doc keys). Packing each token's observed
  * (src, Δlogprob) cells into ONE array row turns the join back to 1:1
  * and folds the S-way accumulation into a per-group micro-map whose key
  * space is bounded by |sources|, not |docs|·|sources|. BIGINT adds
  * reassociate exactly, so the result is bit-identical to the fan-out
  * spelling at any partitioning or merge order.
  *
  * State is O(|sources|) per group — mergeable map-side like any monoid —
  * serialized as (len, utf8 bytes, value) triples.
  */
case class SumWeightedEntries(entries: Expression, weight: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]]
    with BinaryLike[Expression] {

  override def left: Expression = entries
  override def right: Expression = weight

  override def checkInputDataTypes(): TypeCheckResult =
    (entries.dataType, weight.dataType) match {
      case (ArrayType(s: StructType, _), LongType)
          if s.length == 2 && s(0).dataType == StringType &&
            s(1).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case (e, w) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<STRUCT<STRING, BIGINT>>, BIGINT), " +
          s"got (${e.sql}, ${w.sql})")
    }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sum_weighted_entries"

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long]()

  override def update(buf: java.util.HashMap[UTF8String, java.lang.Long],
      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val arr = entries.eval(input)
    val w = weight.eval(input)
    if (arr != null && w != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val wl = w.asInstanceOf[Long]
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (!a.isNullAt(i)) {
          val e = a.getStruct(i, 2)
          // null-field cells contribute nothing (x73 never produces
          // them, but the function is registered for general SQL use)
          if (!e.isNullAt(0) && !e.isNullAt(1)) {
            val k = e.getUTF8String(0)
            // boxed values make present-vs-absent one lookup (the
            // hot path runs |entries| times per input row); UTF8Strings
            // from unsafe rows alias reusable buffers — clone on first
            // insert so the key survives the next row
            val prev = buf.get(k)
            if (prev ne null)
              // INVARIANT: put on an existing key RETAINS the stored
              // (cloned) key — documented java.util.HashMap behavior.
              // Passing the transient buffer-aliased `k` here is safe
              // ONLY because of that; a refactor to a map type (or to
              // compute/merge) that captures the passed key would store
              // the alias and corrupt on the next input row.
              buf.put(k, java.lang.Long.valueOf(
                prev.longValue + wl * e.getLong(1)))
            else buf.put(k.clone(),
              java.lang.Long.valueOf(wl * e.getLong(1)))
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[UTF8String, java.lang.Long],
      other: java.util.HashMap[UTF8String, java.lang.Long])
      : java.util.HashMap[UTF8String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = buf.get(e.getKey)
      if (prev ne null)
        buf.put(e.getKey, java.lang.Long.valueOf(
          prev.longValue + e.getValue.longValue))
      else buf.put(e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    val n = buf.size()
    val keys = new Array[Any](n)
    val values = new Array[Any](n)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      values(i) = e.getValue
      i += 1
    }
    ArrayBasedMapData(keys, values)
  }

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long])
      : Array[Byte] = {
    var bytes = 4
    val sit = buf.keySet().iterator()
    while (sit.hasNext) bytes += 4 + sit.next().numBytes() + 8
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      bb.putInt(kb.length)
      bb.put(kb)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[UTF8String, java.lang.Long] = {
    val buf = new java.util.HashMap[UTF8String, java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.put(UTF8String.fromBytes(kb), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): SumWeightedEntries =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): SumWeightedEntries =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SumWeightedEntries =
    copy(entries = newLeft, weight = newRight)
}
