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
  * Semantics: pairs beyond the shorter length are ignored; a NULL element
  * in the overlapped region makes the result NULL, matching the HOF
  * spelling (`x*y` of a NULL is NULL, and folding NULL into the sum
  * poisons it) — relevant to ad-hoc SQL users reached via
  * `Graft.registerTables`, where `array(1L, NULL)` is easy to write.
  * Integer math — exact and associative, so results are bit-identical to
  * the HOF spelling and to the DuckDB oracle.
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

  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
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
      val assign =
        if (elemNullable) s"if (!${ev.isNull}) { ${ev.value} = $acc; }"
        else s"${ev.value} = $acc;"
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |$assign
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}
