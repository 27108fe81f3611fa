package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.collectPasses]] — the loaded-pass detection/replacement
  * logic (r11 verdict #1), the all-failed-pass degenerate guard (r12
  * ADVICE) and the kept-pass-deficit cooldown re-arm (r12 verdict #1) —
  * against synthetic pass runners. No Spark.
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
    val (all, bad, rearmed) = Bench.collectPasses(3, 2, 1.25, scripted(
      pass("a" -> 1.0, "b" -> 2.0),
      pass("a" -> 1.1, "b" -> 2.1),
      pass("a" -> 0.9, "b" -> 2.2)))
    assert(all.length == 3 && bad.isEmpty && !rearmed)
  }

  test("the r11 shape — 2 of 3 passes loaded — triggers replacements " +
      "and excludes both poisoned passes") {
    // totals 197.9 / 325.2 / 298.7, replacements land clean
    val (all, bad, _) = Bench.collectPasses(3, 2, 1.25, scripted(
      pass("a" -> 197.9), pass("a" -> 325.2), pass("a" -> 298.7),
      pass("a" -> 201.0), pass("a" -> 199.5)))
    assert(all.length == 5)
    assert(bad == Seq(1, 2))
  }

  test("replacement budget bounds the extra passes even when spikes " +
      "keep coming (no cooldown: re-arm never fires)") {
    val (all, bad, rearmed) = Bench.collectPasses(3, 2, 1.25, scripted(
      pass("a" -> 100.0), pass("a" -> 300.0), pass("a" -> 310.0),
      pass("a" -> 320.0), pass("a" -> 330.0)))
    assert(all.length == 5, "exactly replaceCap replacements")
    assert(bad == Seq(1, 2, 3, 4), "still-poisoned passes stay excluded")
    assert(all.length - bad.length == 1, "the min pass is always kept")
    assert(!rearmed)
  }

  test("budget 0 disables spike handling ENTIRELY — no detection, no " +
      "exclusion (the pre-r12 methodology, for A/Bs)") {
    val (all, bad, _) = Bench.collectPasses(3, 0, 1.25, scripted(
      pass("a" -> 100.0), pass("a" -> 300.0), pass("a" -> 101.0)))
    assert(all.length == 3 && bad.isEmpty)
  }

  test("a cleaner replacement re-classifies an earlier pass against " +
      "the new floor") {
    // pass0=130 looks clean vs floor 129 until the 100-total replacement
    // (triggered by pass1's spike) drops the floor
    val (all, bad, _) = Bench.collectPasses(2, 2, 1.25, scripted(
      pass("a" -> 130.0), pass("a" -> 400.0),
      pass("a" -> 100.0), pass("a" -> 102.0)))
    assert(all.length == 4)
    assert(bad == Seq(0, 1))
  }

  test("the absolute-excess guard keeps small-SF noise from tripping " +
      "the ratio test") {
    // ratio 2x, but only 1 s over the floor: JIT drift at a tiny SF,
    // not a host spike — no replacement may run
    val (all, bad, _) = Bench.collectPasses(3, 2, 1.25, scripted(
      pass("a" -> 1.0), pass("a" -> 2.0), pass("a" -> 1.1)))
    assert(all.length == 3 && bad.isEmpty)
  }

  test("comparable totals ignore a query that failed in one pass — a " +
      "partial pass must not make the others look poisoned") {
    // pass1 fails "b" (its raw total is halved); with b excluded from
    // comparison, totals are 1.0 vs 1.1 vs 1.05 — nothing poisoned
    val p1 = Map("a" -> (1.1, true), "b" -> (9.9, false))
    val (all, bad, _) = Bench.collectPasses(3, 2, 1.25, scripted(
      pass("a" -> 1.0, "b" -> 10.0), p1, pass("a" -> 1.05, "b" -> 10.2)))
    assert(all.length == 3 && bad.isEmpty)
  }

  test("an all-failed pass is poisoned itself and cannot collapse the " +
      "comparison — loaded passes stay flagged (r12 ADVICE)") {
    // pass2 fails everything (disk full mid-bench): pre-guard, the
    // okEverywhere intersection went empty, comparable totals all read
    // 0, and the genuinely loaded pass1 silently re-entered the medians
    val dead = Map("a" -> (0.1, false), "b" -> (0.1, false))
    val (all, bad, _) = Bench.collectPasses(3, 2, 1.25, scripted(
      pass("a" -> 100.0, "b" -> 100.0),
      pass("a" -> 300.0, "b" -> 300.0),
      dead,
      pass("a" -> 101.0, "b" -> 101.0),
      pass("a" -> 102.0, "b" -> 99.0)))
    assert(all.length == 5)
    assert(bad == Seq(1, 2), "the spiked pass AND the all-failed pass")
  }

  test("every pass all-failed: one pass is still kept (the caller " +
      "never loses every pass; failures surface via the errors list)") {
    val dead = Map("a" -> (0.1, false))
    val (all, bad, _) = Bench.collectPasses(2, 1, 1.25, scripted(
      dead, dead, dead))
    assert(all.length == 3, "the budget still tries a replacement")
    assert(bad.length == all.length - 1, "exactly one pass kept")
  }

  test("kept-pass deficit + cooldown success: the budget re-arms ONCE " +
      "and the deficit closes (r12 verdict #1)") {
    var cooled = 0
    val (all, bad, rearmed) = Bench.collectPasses(3, 2, 1.25, scripted(
      // base: 1 clean + 2 spiked; budget of 2 burns on two more spikes;
      // after cooldown, two clean replacements close the deficit
      pass("a" -> 100.0), pass("a" -> 300.0), pass("a" -> 310.0),
      pass("a" -> 320.0), pass("a" -> 330.0),
      pass("a" -> 101.0), pass("a" -> 102.0)),
      cooldown = () => { cooled += 1; true })
    assert(all.length == 7)
    assert(bad == Seq(1, 2, 3, 4))
    assert(rearmed && cooled == 1, "cooldown consulted exactly once")
    assert(all.length - bad.length == 3, "deficit closed")
  }

  test("kept-pass deficit + cooldown failure: no re-arm — the deficit " +
      "stands and the caller stamps the record degraded") {
    var cooled = 0
    val (all, bad, rearmed) = Bench.collectPasses(3, 2, 1.25, scripted(
      pass("a" -> 100.0), pass("a" -> 300.0), pass("a" -> 310.0),
      pass("a" -> 320.0), pass("a" -> 330.0)),
      cooldown = () => { cooled += 1; false })
    assert(all.length == 5, "no passes beyond the exhausted budget")
    assert(bad == Seq(1, 2, 3, 4))
    assert(!rearmed && cooled == 1)
  }

  test("no deficit, no cooldown call — a clean run must not sleep on " +
      "the sentinel") {
    var cooled = 0
    val (_, _, rearmed) = Bench.collectPasses(2, 2, 1.25, scripted(
      pass("a" -> 1.0), pass("a" -> 1.05)),
      cooldown = () => { cooled += 1; true })
    assert(!rearmed && cooled == 0)
  }

  test("re-armed budget is bounded too: still-spiked replacements " +
      "after the cooldown do not loop forever") {
    var cooled = 0
    val (all, bad, rearmed) = Bench.collectPasses(2, 1, 1.25, scripted(
      pass("a" -> 100.0), pass("a" -> 300.0),
      pass("a" -> 310.0), pass("a" -> 320.0)),
      cooldown = () => { cooled += 1; true })
    assert(all.length == 4, "base 2 + budget 1 + re-armed budget 1")
    assert(bad == Seq(1, 2, 3))
    assert(rearmed && cooled == 1, "cooldown is consulted at most once")
  }
}
