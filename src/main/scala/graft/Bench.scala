package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR and
  * reports one JSON object two ways:
  *
  *   1. full precision, every query, to `bench_out.json`
  *      (`SPARK_GRAFT_BENCH_OUT` overrides the path) — machine-readable
  *      regardless of how stdout is captured, including per-query
  *      MIN-of-N (`queries_min`/`value_min`) next to the medians: the
  *      min is the quiet-host floor, so when two records disagree, a
  *      moved min says code regression while a moved median alone says
  *      loaded window — and
  *   2. a BOUNDED single line as the FINAL stdout line. The driver's log
  *      capture keeps only the last ~2000 characters of stdout; round 2's
  *      full 80-query line was ~2350 chars, so the capture truncated its
  *      head and the driver recorded `parsed: null`. The final line now
  *      carries the total plus only the slowest queries, greedily added
  *      until a hard 1500-char budget — it always parses from a 2000-char
  *      tail. Nothing may print after it (build.sbt sets
  *      `showSuccess := false` so sbt's own trailer doesn't follow it).
  *
  * The timed sweep runs SPARK_GRAFT_BENCH_PASSES times (default 3) and
  * reports each query's MEDIAN across passes; the headline `value` is
  * the sum of medians. One loaded host window can no longer masquerade
  * as a per-query regression (round 5: a map-only projection read 23×
  * under load in the single graded pass). `pass_totals` preserves the
  * raw per-pass sums so load skew stays diagnosable. When MORE than one
  * pass is loaded the median is no longer enough (round 11: 2 of 3
  * passes took an external spike and the medians carried ~27 s of pure
  * host inflation), so poisoned passes — comparable total above
  * SPARK_GRAFT_BENCH_SPIKE (default 1.25) × the min pass — are replaced
  * from a bounded budget (SPARK_GRAFT_BENCH_REPLACE, default 2) and
  * excluded from the medians; `replaced_passes` records the excluded
  * indices (see [[collectPasses]]). If the budget exhausts while the
  * clean subset is still short of the configured count (round 12: a
  * spike storm left the graded "median" standing on 2 of 3 passes),
  * the run waits for the 1-min load sentinel to clear
  * (SPARK_GRAFT_BENCH_COOLDOWN / SPARK_GRAFT_BENCH_LOAD_OK) and
  * re-arms the budget ONCE; a deficit that survives even that ships
  * `degraded:true` so downstream reads don't mistake a thin median for
  * a full one. Each pass's pre-pass load lands in `pass_load` — the
  * WHY next to `replaced_passes`' which.
  *
  * Before the timed pass, EVERY declared query runs once against the
  * smallest scale factor: per-query numbers are dominated by first-touch
  * costs otherwise (C2-JIT of HOF/minhash expression paths, streaming
  * micro-batch + state-store machinery — measured 10-30x the steady-state
  * cost of the query itself). The warm-up makes the timed pass measure
  * the query, not the JVM. The cache is cleared between queries so a
  * persisted intermediate can't subsidize a later query.
  *
  * A query that throws is recorded explicitly: its duration is reported
  * negative and its name appears in `errors`, and it does NOT count
  * toward `value` — a regression that makes a query fail fast must not
  * improve the reported total.
  */
object Bench {

  /** Pass collection with loaded-pass replacement (the r11 verdict's #1:
    * that round's graded total carried ~27 s of pure host-spike inflation
    * because 2 of 3 passes ran inside an external load window —
    * pass_totals 197.9/325.2/298.7 — and per-query medians then take the
    * inflated middle value).
    *
    * Detection is relative to the best observed floor: a pass whose
    * COMPARABLE total (summed over queries that succeeded in every pass,
    * so a one-pass query failure can't skew the comparison) exceeds
    * `spikeFactor` × the minimum pass total AND sits more than
    * `minExcessSec` above it is poisoned — the absolute guard keeps
    * small-SF smoke runs (pass totals of ~1 s, where JIT drift alone
    * exceeds 25%) from burning the replacement budget on noise, while
    * a real sf0.1 spike (tens of seconds) clears both tests. While fewer
    * than `passes` clean passes exist and the replacement budget
    * (`replaceCap`) lasts, one more pass runs. Poisoned passes are
    * EXCLUDED from per-query medians/mins but stay in `pass_totals`
    * (plus a `replaced_passes` index list) for auditability. The
    * poisoned set is re-evaluated after every replacement — a cleaner
    * floor can re-classify an earlier pass, which is the point: the
    * threshold tracks the quietest window actually observed.
    *
    * When the budget exhausts with FEWER than `passes` clean passes (the
    * r12 graded record: a spike storm burned both replacements and the
    * "median" degenerated to the midpoint of 2 values), `cooldown` runs
    * ONCE: it should block until the host settles (Bench passes a
    * load-sentinel wait) and return whether it did. On true the budget
    * re-arms once and replacement continues; on false (host still
    * loaded — more passes would just be poisoned again) the deficit
    * stands and the caller must stamp its record degraded.
    *
    * Returns (all passes in run order, poisoned pass indices, rearmed).
    * At least one pass is always kept, so the caller never loses every
    * pass; if the budget runs out with fewer than `passes` clean passes,
    * medians simply run over the clean subset.
    */
  private[graft] def collectPasses(
      passes: Int, replaceCap: Int, spikeFactor: Double,
      run: Int => Map[String, (Double, Boolean)],
      minExcessSec: Double = 2.0,
      cooldown: () => Boolean = () => false)
      : (Seq[Map[String, (Double, Boolean)]], Seq[Int], Boolean) = {
    require(passes >= 1 && replaceCap >= 0 && spikeFactor > 1.0 &&
      minExcessSec >= 0.0)
    val all = scala.collection.mutable.ArrayBuffer
      .empty[Map[String, (Double, Boolean)]]
    (0 until passes).foreach(p => all += run(p))
    // replaceCap 0 = spike handling fully OFF (no detection, no
    // exclusion) — the pre-r12 methodology, reproducible for A/Bs.
    // Detection-without-replacement would silently change which passes
    // the medians run over while claiming to be "disabled".
    if (replaceCap == 0) return (all.toSeq, Nil, false)
    def poisoned(): Seq[Int] = {
      // A pass that failed EVERY query is excluded from the comparison
      // AND poisoned itself: with it in the comparable set, okEverywhere
      // goes empty, every comparable total collapses to 0, and genuinely
      // loaded passes silently un-flag and re-enter the medians (r12
      // ADVICE — the disk-full-mid-bench shape). It cannot anchor a
      // floor either: a pass with zero successful queries measured
      // nothing.
      val allFailed = all.zipWithIndex.collect {
        case (m, i) if !m.values.exists(_._2) => i }.toSet
      val cmp = all.zipWithIndex.toSeq
        .filterNot { case (_, i) => allFailed(i) }
      val spiked: Seq[Int] =
        if (cmp.isEmpty) Nil
        else {
          val okEverywhere = cmp
            .map(_._1.collect { case (n, (_, true)) => n }.toSet)
            .reduce(_ intersect _)
          if (okEverywhere.isEmpty) Nil
          else {
            val totals = cmp.map { case (m, i) =>
              (m.collect {
                case (n, (dt, true)) if okEverywhere(n) => dt }.sum, i) }
            val floor = totals.map(_._1).min
            totals.collect { case (t, i)
              if t > floor * spikeFactor && t - floor > minExcessSec => i }
          }
        }
      val p = (allFailed ++ spiked).toSeq.sorted
      // never lose every pass: a record with zero kept passes has no
      // medians at all — keep the first (its failures stay visible as
      // negative durations + the errors list)
      if (p.size == all.size) p.tail else p
    }
    var rearmed = false
    var replaced = 0
    def deficit: Boolean = all.size - poisoned().size < passes
    while (deficit && replaced < replaceCap) {
      all += run(all.size)
      replaced += 1
    }
    // kept-pass deficit after the budget (r12 verdict #1): one bounded
    // chance to settle and re-arm, instead of quietly shipping a
    // degenerate median
    if (deficit && cooldown()) {
      rearmed = true
      replaced = 0
      while (deficit && replaced < replaceCap) {
        all += run(all.size)
        replaced += 1
      }
    }
    (all.toSeq, poisoned(), rearmed)
  }

  def main(args: Array[String]): Unit = {
    // parsed FIRST so a malformed value fails before the session build
    // and the (expensive) warm-up pass, not after them
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES") match {
      case None => 3
      case Some(p) =>
        // toIntOption, not matches-then-toInt: an all-digit value past
        // Int.MaxValue must hit THIS message, not a raw NumberFormatException
        val n = p.toIntOption.getOrElse(0)
        require(n >= 1,
          s"SPARK_GRAFT_BENCH_PASSES must be a positive integer, got '$p'")
        n
    }
    // spike handling knobs (see collectPasses): parsed up front like
    // SPARK_GRAFT_BENCH_PASSES so a malformed value fails before the
    // session build. Replacement budget 0 disables spike handling
    // entirely (no detection, no exclusion — the pre-r12 methodology).
    val replaceCap = sys.env.get("SPARK_GRAFT_BENCH_REPLACE") match {
      case None => 2
      case Some(p) =>
        val n = p.toIntOption.getOrElse(-1)
        require(n >= 0,
          s"SPARK_GRAFT_BENCH_REPLACE must be a non-negative integer, " +
            s"got '$p'")
        n
    }
    val spikeFactor = sys.env.get("SPARK_GRAFT_BENCH_SPIKE") match {
      case None => 1.25
      case Some(p) =>
        val v = p.toDoubleOption.getOrElse(0.0)
        require(v > 1.0,
          s"SPARK_GRAFT_BENCH_SPIKE must be a number > 1, got '$p'")
        v
    }
    // kept-pass-deficit cooldown (r12 verdict #1): when the replacement
    // budget exhausts with fewer clean passes than configured, wait up
    // to this many seconds for the 1-min load average to drop under
    // SPARK_GRAFT_BENCH_LOAD_OK, then re-arm the budget once. 0 turns
    // the re-arm off (the record then ships degraded:true instead).
    // Default 240 s: our own 32-thread pass drives the 1-min average to
    // ~30, which decays under 4.0 in ~120 s on a quiet host — the wait
    // must outlast self-load decay or it would always time out.
    val cooldownMax = sys.env.get("SPARK_GRAFT_BENCH_COOLDOWN") match {
      case None => 240
      case Some(p) =>
        val n = p.toIntOption.getOrElse(-1)
        require(n >= 0,
          s"SPARK_GRAFT_BENCH_COOLDOWN must be a non-negative integer " +
            s"of seconds, got '$p'")
        n
    }
    val loadOk = sys.env.get("SPARK_GRAFT_BENCH_LOAD_OK") match {
      case None => 4.0
      case Some(p) =>
        val v = p.toDoubleOption.getOrElse(0.0)
        require(v > 0.0,
          s"SPARK_GRAFT_BENCH_LOAD_OK must be a positive number, got '$p'")
        v
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir =
      sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Generated-class cache sized for the REGISTRY, not the default
      // 100 entries (static conf — must precede session creation). The
      // r10→r11 loaded-window forensics (LoadProf, BASELINE.md): with
      // 251 queries cycling, a 100-entry LRU evicts every generated
      // class between passes, so each pass re-runs Janino + fresh
      // HotSpot JIT for every query — the token-LM rows carry the
      // largest codegen surface (x92 ~5 s, x93 ~2.9 s of measured
      // per-run compile at the default) and were the repeat victims
      // whenever compiler threads contended with a loaded host. At
      // 8192 entries steady-state passes reuse warm classes: quiet
      // medians drop 10-40% across the board and the family's
      // loaded-window inflation falls to at-or-below control rows'.
      // Any long-lived session embedding the registry should set the
      // same (Graft facade scaladoc). Env-overridable for A/B
      // forensics only — the driver never sets it.
      .config("spark.sql.codegen.cache.maxEntries", {
        val raw = sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192")
        // validated like SPARK_GRAFT_BENCH_PASSES: a malformed value
        // must fail with a message naming the env var, not a bare
        // NumberFormatException before the session exists
        val n = raw.toIntOption.getOrElse(0)
        require(n >= 1, "SPARK_GRAFT_CODEGEN_CACHE must be a positive " +
          s"integer, got '$raw'")
        n
      })
      // The codegen cache is keyed by (classloader, source): under
      // Spark 4's default session-artifact isolation each STREAMING
      // run applies a per-execution artifact classloader, so identical
      // generated source recompiles on every drain (measured: st01
      // re-Janinos its full 14 units per run at ANY cache size; zero
      // with isolation off — CodegenCacheSpec pins it). This engine
      // registers no session artifacts, so isolation buys nothing.
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Dev-only focus filter: SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the
    // run to the named queries (the driver never sets it — full sweep).
    // Unknown names fail fast: a typo must not produce a vacuous
    // zero-query "green" bench.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown queries: " +
          unknown.toSeq.sorted.mkString(", "))
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // warm-up: every query once at the smallest SF (plans, codegen, JIT,
    // streaming machinery), then a clean slate for the timed pass
    ordered.foreach { case (_, fn) =>
      try Caches.scope(spark)(fn(spark, warmDir).count())
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    // serve-path rows (x12s/x64s) measure SERVING: build their persisted
    // artifacts for the timed dir up front (idempotent; the build cost
    // is what x10/x41 already measure)
    // pre-build only the families a selected serve row actually reads —
    // a targeted x43s run must not pay the IVF index build and vice versa
    // the per-family row sets live NEXT TO their builders
    // (SimilarityQueries.serveRows / AuditServe.serveRows), so a new
    // serve-reading row is declared once, where the artifact is built
    val similarityServe = graft.operators.SimilarityQueries.serveRows
    val auditServe = graft.operators.AuditServe.serveRows
    val graphServe = graft.operators.GraphServe.serveRows
    if (ordered.exists(q => similarityServe(q._1)))
      try graft.operators.SimilarityQueries.prepareServe(spark, sfDir)
      catch { case _: Throwable => () }
    if (ordered.exists(q => auditServe(q._1)))
      try graft.operators.AuditServe.prepare(spark, sfDir)
      catch { case _: Throwable => () }
    if (ordered.exists(q => graphServe(q._1)))
      try graft.operators.GraphServe.prepare(spark, sfDir)
      catch { case _: Throwable => () }
    spark.catalog.clearCache()
    // Median-of-N timed passes (default 3, SPARK_GRAFT_BENCH_PASSES
    // overrides): a single pass charges transient host load to whichever
    // queries it happens to hit — round 5's graded run showed a map-only
    // projection going 23× under a loaded window. The per-query MEDIAN
    // across passes is robust to one loaded pass, and the headline total
    // is the sum of medians (a "clean machine" estimate, deliberately
    // NOT the median of pass totals, which would keep per-query and
    // total inconsistent).
    //
    // Each pass starts at a ROTATED offset (pass p begins p/passes of
    // the way through the sorted list, wrapping): with identical
    // ordering, every pass visits a given query at roughly the same
    // wall-clock offset, so one multi-minute host transient can cover
    // the SAME query in 2 of 3 passes and poison its median — the
    // round-8 x42 anomaly shape (14.6 s driver median vs 3.0 s
    // same-code elsewhere). Rotation makes a time-localized transient
    // land on DIFFERENT queries in each pass; per-query medians then
    // survive any single transient shorter than a full pass.
    // 1-min load average — the external-contention sentinel (the
    // IsoProbe mechanism). Sampled at the START of each pass so the
    // record says WHY a pass was excluded, not just which (r12 verdict
    // #5); readings for passes ≥ 1 include the decaying tail of our own
    // previous 32-thread pass, so the diagnostic read is RELATIVE — a
    // spiked pass stands out against its neighbors' self-load floor.
    def load1(): Double =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val passLoads = scala.collection.mutable.ArrayBuffer.empty[Double]
    // Cooldown for a kept-pass deficit: poll until the sentinel clears
    // loadOk or cooldownMax elapses; returns whether it cleared (false
    // ⇒ no re-arm — more passes on a still-loaded host would just be
    // poisoned again, and the record ships degraded:true instead).
    def cooldown(): Boolean = {
      if (cooldownMax == 0) return false
      val deadline = System.nanoTime() + cooldownMax * 1000000000L
      var l = load1()
      while (l > loadOk && l >= 0.0 && System.nanoTime() < deadline) {
        Thread.sleep(5000)
        l = load1()
      }
      l >= 0.0 && l <= loadOk
    }
    def runPass(p: Int): Map[String, (Double, Boolean)] = {
      passLoads += load1()
      val rot = ((p % passes) * ordered.size) / passes
      val rotated = ordered.drop(rot) ++ ordered.take(rot)
      rotated.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          // scoped: cache release is part of the query's own contract
          // now (Caches.scope), so the timed pass measures it too
          try { Caches.scope(spark)(fn(spark, sfDir).count()); true }
          catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        name -> (dt, ok)
      }.toMap
    }
    // spike handling (r11 verdict #1): collect the requested passes,
    // then replace any loaded one (comparable total > spikeFactor × the
    // min pass) from a bounded budget; poisoned passes stay visible in
    // pass_totals + replaced_passes but are excluded from the medians
    val (allPasses, replacedIdx, rearmed) =
      collectPasses(passes, replaceCap, spikeFactor, runPass,
        cooldown = cooldown _)
    val perPass: Seq[Map[String, (Double, Boolean)]] =
      allPasses.zipWithIndex
        .collect { case (m, i) if !replacedIdx.contains(i) => m }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val results = ordered.map { case (name, _) =>
      val runs = perPass.map(_(name))
      val ok = runs.forall(_._2)
      val okDts = runs.collect { case (dt, true) => dt }
      val dt = if (okDts.nonEmpty) median(okDts) else median(runs.map(_._1))
      (name, dt, ok)
    }
    // per-query MIN across passes (full-precision file only): the floor
    // a quiet host would read — medians absorb ONE loaded pass, mins
    // separate host drift from code regressions when two records
    // disagree (a code riser moves the min; a loaded window doesn't).
    // A query that failed EVERY pass is negated and excluded from the
    // summed floor, mirroring the median record: a fail-fast regression
    // must not read as a floor improvement.
    val mins = ordered.map { case (name, _) =>
      val runs = perPass.map(_(name))
      val okDts = runs.collect { case (dt, true) => dt }
      val ok = okDts.nonEmpty
      (name, if (ok) okDts.min else -runs.map(_._1).min, ok)
    }
    // ALL passes including poisoned ones — the audit trail; the kept
    // set is pass_totals minus the replaced_passes indices
    val passTotals = allPasses
      .map(_.values.collect { case (dt, true) => dt }.sum)
    val total = results.collect { case (_, dt, true) => dt }.sum
    val errors = results.collect { case (n, _, false) => n }
    def compact(d: Double): String = f"$d%.2f".stripSuffix("0") match {
      case s if s.endsWith(".") => s + "0"
      case s                    => s
    }
    // Sub-second rollup so a TRUNCATED record (the driver keeps only the
    // slowest entries from the bounded stdout line) still accounts for
    // the full total: total ≈ sum(retained queries) + sum_under_1s.
    val under1 = results.filter { case (_, dt, ok) => ok && dt < 1.0 }
    val nUnder1 = under1.size
    val sumUnder1 = under1.map(_._2).sum
    // `extra` carries optional additional JSON fields (leading comma
    // included), assembled HERE rather than by string surgery on the
    // rendered output, so a future change to the trailing shape cannot
    // silently corrupt the file record.
    def render(entries: Seq[(String, Double, Boolean)],
               fmt: Double => String,
               extra: String = ""): String = {
      val qs = entries
        .map { case (n, dt, ok) => s"\"$n\":" + fmt(if (ok) dt else -dt) }
        .mkString("{", ",", "}")
      val errs =
        if (errors.isEmpty) ""
        else errors.mkString(",\"errors\":[\"", "\",\"", "\"]")
      val pts = passTotals.map(fmt).mkString("[", ",", "]")
      val repl = replacedIdx.mkString("[", ",", "]")
      val loads = passLoads.map(l => f"$l%.1f").mkString("[", ",", "]")
      // `passes` = the CONFIGURED count; after replacement it matches
      // neither pass_totals' length nor the clean-pass count the medians
      // ran over, so both actuals are recorded explicitly. `degraded`
      // (r12 verdict #1): even after the one cooldown re-arm the clean
      // subset is short of the configured count — the medians stand on
      // fewer passes than BASELINE.md assumes and must be read so.
      val degraded = perPass.length < passes
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec"""" +
        s""","n_queries":${results.size},"passes":$passes""" +
        s""","n_passes_run":${allPasses.length}""" +
        s""","n_passes_kept":${perPass.length}""" +
        s""","n_under_1s":$nUnder1,"sum_under_1s":${fmt(sumUnder1)}""" +
        s""","pass_totals":$pts,"replaced_passes":$repl""" +
        s""","pass_load":$loads,"degraded":$degraded,"rearmed":$rearmed""" +
        s""","queries":$qs$errs$extra,"sf":"$sfDir"}"""
    }
    val benchOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_out.json")
    // file record = the bounded-line fields plus value_min/queries_min
    // (kept OUT of the stdout line: the driver's 2000-char tail capture
    // must keep holding the whole line)
    val minQs = mins
      .map { case (n, dt, _) => s"\"$n\":$dt" }.mkString("{", ",", "}")
    val valueMin = mins.collect { case (_, dt, true) => dt }.sum
    val withMins = render(results, _.toString,
      extra = s""","value_min":$valueMin,"queries_min":$minQs""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(benchOut), withMins.getBytes("UTF-8"))
    spark.stop()
    // Final stdout line: slowest-first, greedily kept under a 1500-char
    // budget so a 2000-char tail capture always holds the whole line.
    // Failed queries are always included (negative duration + errors list).
    val failed = results.filter(!_._3)
    val bySlowest = results.filter(_._3).sortBy(-_._2)
    val budget = 1500
    val picked = bySlowest.foldLeft(failed) { (acc, e) =>
      val cand = acc :+ e
      if (render(cand, compact).length <= budget) cand else acc
    }
    println(render(picked.sortBy(_._1), compact))
  }
}
