package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 32-bit SimHash (Charikar '02 bit-majority) over a token-hash array in
  * ONE traversal.
  *
  * Bit-identical to the composable spelling the oracle uses —
  * `CASE WHEN 2 * size(filter(th, h -> (shiftright(h, b) & 1) = 1)) >
  * size(th) THEN 1<<b END` summed over b — but where that spelling walks
  * the array 32 times through interpreted lambdas (allocating a filtered
  * array per bit per row), this accumulates all 32 bit-counts in a single
  * pass inside whole-stage codegen. NULL elements match `filter`
  * semantics: excluded from the per-bit count, included in the
  * denominator (`size` counts nulls).
  */
case class SimHashBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT>, got ${t.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (2 * counts(b) > n) out |= (1L << b)
      b += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final int[] $counts = new int[32];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final long $h = $a.getLong($i);
         |    for (int $b = 0; $b < 32; $b++) {
         |      if ((($h >> $b) & 1L) == 1L) $counts[$b]++;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  if (2 * $counts[$b] > $n) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHashBits = copy(child = newChild)
}
