package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `bands` SRP (signed-random-projection) band keys of a quantized
  * vector in ONE pass.
  *
  * Bit-identical to the composable spelling the DuckDB oracle keeps —
  * per hyperplane `h`, `dt = Σ_i qe[i] · (((h+1)·2654435761 + i·40503)
  * % 2039 − 1019)` with bit `h % bits` of band `h / bits` set iff
  * `dt ≥ 0` — but where that spelling is three nested higher-order
  * `aggregate` lambdas (~bands·bits·d interpreted expression-node visits
  * per row, catastrophic in plans that fall out of whole-stage codegen:
  * the streaming st18 sink ran it 50× slower than batch), this is a flat
  * JIT-friendly primitive loop. Arithmetic is overflow-checked
  * (Math.multiplyExact/addExact) to match ANSI Spark and DuckDB on the
  * composable form; quantized components (~1e3) × weights (≤1019) ×
  * d = 64 sit far below the boundary. A NULL input array yields NULL; a
  * NULL element yields NULL (the engine's quantized vectors never carry
  * one — the HOF form's per-bit `CASE WHEN NULL >= 0` zero-bit is a
  * semantics nobody relies on, and SrpBandKeysSpec pins the non-null
  * equivalence exhaustively).
  *
  * `dims` is the REQUIRED vector dimensionality: the hyperplane weights
  * are a function of component INDEX, so a vector of the wrong length
  * would silently hash under a truncated/extended weight set and
  * diverge from the fixed-`dims` HOF twin and DuckDB oracle. A
  * malformed vector fails loudly here instead (the only place the
  * actual length is visible).
  */
case class SrpBandKeys(child: Expression, bands: Int, bits: Int, dims: Int)
    extends UnaryExpression with CodegenFallback {

  require(bands > 0 && bits > 0 && bits <= 62,
    s"band shape out of range: $bands x $bits")
  require(dims > 0, s"dims must be positive: $dims")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT>, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "srp_band_keys"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != dims) throw new IllegalArgumentException(
      s"srp_band_keys: input vector has $n elements, expected $dims — " +
        "a malformed vector must fail loudly, not hash divergently")
    val v = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      v(i) = x.getLong(i)
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < bits) {
        val h1 = (b * bits + r + 1).toLong
        var dt = 0L
        i = 0
        while (i < n) {
          val w = (h1 * 2654435761L + (i + 1).toLong * 40503L) % 2039L - 1019L
          dt = Math.addExact(dt, Math.multiplyExact(v(i), w))
          i += 1
        }
        if (dt >= 0L) key |= (1L << r)
        r += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SrpBandKeys = copy(child = newChild)

  // the old 3-arg copy shape is gone on purpose: every caller must say
  // what dimensionality it expects (see the class doc)
}
