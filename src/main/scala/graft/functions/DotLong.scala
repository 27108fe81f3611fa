package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product over two `ARRAY<BIGINT>` columns.
  *
  * The composable spelling — `aggregate(zip_with(a, b, (x,y) -> x*y), 0,
  * (acc,v) -> acc+v)` — allocates a zipped array per row and interprets
  * two lambda calls per element outside whole-stage codegen; over an
  * N-vectors × K-probes similarity scan that's the hot loop of the whole
  * query. This expression generates a tight primitive `long` loop into the
  * enclosing codegen stage instead: no allocation, no virtual calls, and
  * the surrounding filter/projection stays fused.
  *
  * Semantics match the HOF spelling exactly, because ad-hoc SQL users
  * (reached via `Graft.registerTables`) rely on the documented
  * equivalence: MISMATCHED lengths yield NULL (`zip_with` pads the
  * shorter side with NULLs, whose products poison the fold), a NULL
  * element yields NULL, and the arithmetic is OVERFLOW-CHECKED
  * (Math.multiplyExact/addExact — ANSI Spark 4 and DuckDB both raise on
  * the composable spelling's overflow, so wrapping silently here would
  * be a divergence; the engine's own quantized vectors sit at ~1e3 per
  * component × d = 64, ~10 orders below the boundary, and the JIT's
  * overflow-checked intrinsics cost nothing when the branch never
  * fires). Integer math — exact and associative, so results are
  * bit-identical to the HOF spelling and to the DuckDB oracle.
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "dot_long"

  /** Whether a NULL element can appear (drives the codegen null path; when
    * the schema proves elements non-null the loop stays check-free).
    */
  private def elemNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, n1), ArrayType(_, n2)) => n1 || n2
    case _ => true
  }

  // a length mismatch yields NULL even when elements are non-null, so
  // the result is always potentially null
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc = Math.addExact(acc,
        Math.multiplyExact(x.getLong(i), y.getLong(i)))
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (elemNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc = Math.addExact($acc,
         |      Math.multiplyExact($a.getLong($i), $b.getLong($i)));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}
