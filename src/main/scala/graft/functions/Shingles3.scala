package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-gram shingles of a text column in ONE pass — the
  * tokenize → 3-gram → distinct chain the whole dedup family starts
  * from (x06/x08/x14/x29/x42/x43 via `lshSigs`/`ngramJaccard`/
  * `containmentPairs`).
  *
  * Bit-identical to the composable spelling the oracle mirrors —
  * `split(text, ' ')` then
  * `array_distinct(transform(sequence(1, size(w) - 2), i -> concat(...)))`
  * with the `size(w) < 3 ⇒ array(text)` short-doc fallback — but where
  * that spelling allocates a lambda frame and an element_at lookup per
  * gram through three interpreted higher-order functions plus a full
  * array_distinct pass, this tokenizes once (the same UTF8String regex
  * split StringSplit uses, so empty tokens from repeated/trailing
  * spaces match exactly), builds each gram with one UTF8String.concat,
  * and dedups in an insertion-ordered hash set. CodegenFallback: the
  * split + concat byte work dominates; generated-code plumbing would
  * not move the needle.
  *
  * Like Spark's own StringSplit, the short-doc fallback returns the
  * input string by reference (consumers copy during projection of the
  * same row); the gram strings are fresh buffers from concat.
  */
case class Shingles3(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${t.sql}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingles3"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    // limit -1 keeps trailing empty tokens — the split(text, ' ')
    // contract the HOF spelling (and the DuckDB oracle) relies on
    val words = text.split(Shingles3.Space, -1)
    if (words.length < 3) return new GenericArrayData(Array[Any](text))
    val seen = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i + 2 < words.length) {
      seen.add(UTF8String.concat(words(i), Shingles3.Space, words(i + 1),
        Shingles3.Space, words(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](Array.empty[AnyRef]))
  }

  override protected def withNewChildInternal(
      newChild: Expression): Shingles3 = copy(child = newChild)
}

object Shingles3 {
  private val Space: UTF8String = UTF8String.fromString(" ")
}
