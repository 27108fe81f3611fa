package graft

import org.scalatest.funsuite.AnyFunSuite

/** The log-boundary parity argument behind x36/x39/x72/x76 (see the
  * LpScale scaladoc in PipelineQueries): `floor(ln(x)·1e6 + 0.5)` is
  * engine-independent as long as `ln(x)·1e6 + 0.5` never lands within
  * the engines' 1-ulp `ln` disagreement band of an exact integer. This
  * spec measures that distance over every count ratio the micro-nat
  * queries can form at test scale and pins that the worst case sits
  * orders of magnitude above the drift band — so a libm-vs-JVM ulp flip
  * cannot change any aggregated integer, which is what the DuckDB hash
  * gate relies on.
  */
class LogBoundarySpec extends AnyFunSuite {

  test("no count ratio at test scale puts ln(c/n)*1e6+0.5 near an integer") {
    // c/n for all 1 <= c <= n <= 2000 covers every unigram probability
    // (and add-one-smoothed bigram ratio) the sf-test corpora can
    // produce; the 1-ulp drift band for |ln| <= ln(2000) ~ 7.6 scaled
    // by 1e6 is |ln|*1e6*2^-52 < 2e-9.
    var worst = Double.MaxValue
    var worstC = 0L
    var worstN = 0L
    var n = 1
    while (n <= 2000) {
      var c = 1
      // exhaustive: includes c == n (ln 1 = 0 exactly)
      while (c <= n) {
        val v = math.log(c.toDouble / n.toDouble) * 1e6 + 0.5
        val d = math.abs(v - math.rint(v))
        // the exact-integer hit v == 0 at c == n is floor-safe on both
        // engines (ln(1) is exactly 0 in every IEEE libm): skip it
        if (!(c == n) && d < worst) { worst = d; worstC = c; worstN = n }
        c += 1
      }
      n += 1
    }
    info(s"closest boundary approach: ln($worstC/$worstN)*1e6+0.5 is " +
      f"$worst%.3e from an integer (drift band < 2e-9)")
    // measured worst case over this domain: ln(849/1585)*1e6+0.5 is
    // 3.38e-8 from an integer — 17x the <2e-9 drift band. The assert
    // keeps 5x headroom above the band.
    assert(worst > 1e-8,
      s"ratio $worstC/$worstN sits $worst from a floor boundary — " +
        "inside libm-drift territory; switch to the BigDecimal-series " +
        "ln fallback documented at LpScale")
  }

  test("a 1-ulp ln perturbation never flips the floored micro-nat") {
    // direct statement of the parity contract on a dense probe set
    var n = 1
    while (n <= 500) {
      var c = 1
      while (c < n) {
        val x = c.toDouble / n.toDouble
        val l = math.log(x)
        val up = Math.nextUp(l) * 1e6 + 0.5
        val dn = Math.nextDown(l) * 1e6 + 0.5
        assert(math.floor(up) == math.floor(dn),
          s"floor flips under 1-ulp ln drift at c=$c n=$n")
        c += 1
      }
      n += 1
    }
  }
}
