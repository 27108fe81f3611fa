package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native distinct-intersection COUNT over two SORTED `ARRAY<BIGINT>`
  * columns — the verify kernel of the prefix-filtered similarity join
  * (`x70_prefix_jaccard`).
  *
  * The composable spelling — `size(array_intersect(a, b))` — builds a
  * hash set over one side and materializes the full intersection array
  * per row only to take its length; over a candidate-pair verify scan
  * (tens of thousands of pairs × ~hundreds of elements each) that
  * allocation was the r13 profile's hottest verify stage. The inputs
  * there are already `array_sort`ed (the prefix filter NEEDS the global
  * hash order), so the count falls out of one allocation-free two-pointer
  * merge walk that whole-stage codegen fuses into the enclosing stage —
  * the [[DotLong]] discipline applied to set intersection.
  *
  * Semantics: the number of DISTINCT values present in both arrays —
  * exactly `size(array_intersect(a, b))` (Spark dedups) and DuckDB's
  * `len(list_intersect(a, b))`, PROVIDED both arrays are sorted
  * ascending; duplicates on either side are counted once (the merge walk
  * skips runs of equal values). PRECONDITION, documented not policed
  * (the dot_long contract): callers must pass sorted arrays — unsorted
  * input silently undercounts. A NULL array yields NULL (BinaryExpression
  * null-intolerance); a NULL element ENCOUNTERED DURING THE MERGE WALK
  * yields NULL — a trailing NULL past the point where the other side is
  * exhausted is never scanned, so it does not (r13 ADVICE: the NULL
  * semantics are scan-order-dependent). Either way this is loudly
  * different from array_intersect's null-as-value treatment — the
  * engine's hashed shingle arrays are provably null-free, and an ad-hoc
  * caller with nullable elements should use the composable spelling
  * instead.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
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

  override def prettyName: String = "intersect_count_sorted"

  private def elemNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, n1), ArrayType(_, n2)) => n1 || n2
    case _ => true
  }

  // a NULL element yields NULL even when the arrays themselves are
  // non-null, so the result is always potentially null
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        cnt += 1
        while (i < n && !x.isNullAt(i) && x.getLong(i) == xv) i += 1
        while (j < m && !y.isNullAt(j) && y.getLong(j) == yv) j += 1
      }
    }
    cnt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val nullCheck =
        if (elemNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }"
        else ""
      val skipNullX = if (elemNullable) s"!$a.isNullAt($i) && " else ""
      val skipNullY = if (elemNullable) s"!$b.isNullAt($j) && " else ""
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |long $cnt = 0L;
         |while ($i < $n && $j < $m) {
         |  $nullCheck
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $cnt++;
         |    while ($i < $n && ${skipNullX}$a.getLong($i) == $xv) { $i++; }
         |    while ($j < $m && ${skipNullY}$b.getLong($j) == $yv) { $j++; }
         |  }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $cnt; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}
