package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All K md5-minhash signatures of a shingle array in ONE pass.
  *
  * Bit-identical to the composable spelling used by the oracle —
  * `CAST(conv(substr(md5(concat('<i>|', s)), 1, 15), 16, 10) AS BIGINT)`
  * min-reduced per i — but where that spelling walks the array K times
  * through interpreted higher-order functions (allocating a hex string and
  * a concat buffer per shingle per i), this computes the digest of
  * `i| ++ shingle` bytes directly and folds all K minimums in a single
  * traversal with one thread-local MessageDigest. CodegenFallback: the md5
  * loop dominates, so generated-code plumbing would not move the needle.
  *
  * Assumes a non-empty shingle array (the shingle expression guarantees
  * ≥1 via its whole-text fallback); an empty array yields Long.MaxValue
  * sentinels rather than the HOF spelling's NULLs. NULL ELEMENTS are
  * skipped — the HOF spelling's md5(concat('i|', NULL)) is NULL and
  * array_min ignores NULLs, so skipping is the semantics ad-hoc SQL
  * users (reached via `Graft.registerTables`) already get from the
  * composable form; the engine's own shingle arrays never contain
  * nulls.
  */
case class MinHashSigs(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0 && k < 100, s"k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sigs"

  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"$i|".getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = MinHashSigs.digests.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val shingle = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          md.reset()
          md.update(prefixes(j))
          md.update(shingle)
          val v = MinHashSigs.first60Bits(md.digest())
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of a digest as a long — exactly
    * `conv(substr(hex, 1, 15), 16, 10)`: 7 full bytes + the high nibble
    * of the 8th, 60 bits, always non-negative.
    */
  private[functions] def first60Bits(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }
}
