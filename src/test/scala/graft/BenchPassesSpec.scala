package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.collectPasses]] — the loaded-pass detection/replacement
  * logic (r11 verdict #1) — against synthetic pass runners. No Spark.
  */
class BenchPassesSpec extends AnyFunSuite {

  private def pass(qs: (String, Double)*): Map[String, (Double, Boolean)] =
    qs.map { case (n, t) => n -> (t, true) }.toMap

  // a scripted runner: pass p returns script(p); appends beyond the
  // script fail the test (an unexpected replacement ran)
  private def scripted(script: Map[String, (Double, Boolean)]*)
      : Int => Map[String, (Double, Boolean)] =
    p => {
      assert(p < script.length, s"unexpected pass $p requested")
      script(p)
    }

  test("all-clean passes: nothing replaced, nothing run beyond the " +
      "requested count") {
    val (all, bad) = Bench.collectPasses(3, 2, 1.25, scripted(
      pass("a" -> 1.0, "b" -> 2.0),
      pass("a" -> 1.1, "b" -> 2.1),
      pass("a" -> 0.9, "b" -> 2.2)))
    assert(all.length == 3 && bad.isEmpty)
  }

  test("the r11 shape — 2 of 3 passes loaded — triggers replacements " +
      "and excludes both poisoned passes") {
    // totals 197.9 / 325.2 / 298.7, replacements land clean
    val (all, bad) = Bench.collectPasses(3, 2, 1.25, scripted(
      pass("a" -> 197.9), pass("a" -> 325.2), pass("a" -> 298.7),
      pass("a" -> 201.0), pass("a" -> 199.5)))
    assert(all.length == 5)
    assert(bad == Seq(1, 2))
  }

  test("replacement budget bounds the extra passes even when spikes " +
      "keep coming") {
    val (all, bad) = Bench.collectPasses(3, 2, 1.25, scripted(
      pass("a" -> 100.0), pass("a" -> 300.0), pass("a" -> 310.0),
      pass("a" -> 320.0), pass("a" -> 330.0)))
    assert(all.length == 5, "exactly replaceCap replacements")
    assert(bad == Seq(1, 2, 3, 4), "still-poisoned passes stay excluded")
    assert(all.length - bad.length == 1, "the min pass is always kept")
  }

  test("budget 0 disables spike handling ENTIRELY — no detection, no " +
      "exclusion (the pre-r12 methodology, for A/Bs)") {
    val (all, bad) = Bench.collectPasses(3, 0, 1.25, scripted(
      pass("a" -> 100.0), pass("a" -> 300.0), pass("a" -> 101.0)))
    assert(all.length == 3 && bad.isEmpty)
  }

  test("a cleaner replacement re-classifies an earlier pass against " +
      "the new floor") {
    // pass0=130 looks clean vs floor 129 until the 100-total replacement
    // (triggered by pass1's spike) drops the floor
    val (all, bad) = Bench.collectPasses(2, 2, 1.25, scripted(
      pass("a" -> 130.0), pass("a" -> 400.0),
      pass("a" -> 100.0), pass("a" -> 102.0)))
    assert(all.length == 4)
    assert(bad == Seq(0, 1))
  }

  test("the absolute-excess guard keeps small-SF noise from tripping " +
      "the ratio test") {
    // ratio 2x, but only 1 s over the floor: JIT drift at a tiny SF,
    // not a host spike — no replacement may run
    val (all, bad) = Bench.collectPasses(3, 2, 1.25, scripted(
      pass("a" -> 1.0), pass("a" -> 2.0), pass("a" -> 1.1)))
    assert(all.length == 3 && bad.isEmpty)
  }

  test("comparable totals ignore a query that failed in one pass — a " +
      "partial pass must not make the others look poisoned") {
    // pass1 fails "b" (its raw total is halved); with b excluded from
    // comparison, totals are 1.0 vs 1.1 vs 1.05 — nothing poisoned
    val p1 = Map("a" -> (1.1, true), "b" -> (9.9, false))
    val (all, bad) = Bench.collectPasses(3, 2, 1.25, scripted(
      pass("a" -> 1.0, "b" -> 10.0), p1, pass("a" -> 1.05, "b" -> 10.2)))
    assert(all.length == 3 && bad.isEmpty)
  }
}
