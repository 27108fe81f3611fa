package graft

import org.apache.spark.sql.SparkSession

/** Per-round recorder for the ISOLATED doubling probes (r11 verdict #3,
  * sentinel discipline r12 verdict #2).
  *
  * SCALE.md round 11: x71/x46's in-suite 20× cells are heap-bound noise
  * (four heavy rows' 20× states cycling through one shared JVM), and
  * their clean reading — ~1.97×/1.96× per 10×→20× doubling, i.e. β ≈
  * 0.98 marginally linear — existed only as prose from one-off probes.
  * This main makes the probe a recorded, diffable number: each row runs
  * in its OWN SparkSession (stopped and rebuilt between rows, so no
  * neighbor state survives into the measurement), warm pass at the
  * smallest size, then min-of-N at each size, and the per-doubling
  * ratio `t(2m)/t(m)` plus its implied exponent `beta2 = log2(ratio)`
  * merge into the refit record as a top-level `isolated` block.
  *
  * The load sentinel ACTS, not just records (r12: the probe window
  * itself was spiked — x71 passes 25.4/12.8/41.7/49.6/6.8 s — and the
  * recorded ratio disagreed with the clean prose probe). Before every
  * timed pass the probe WAITS (bounded) for the 1-min load average to
  * drop under the threshold; the settled reading is the pass's
  * sentinel. Waiting is what makes the sentinel meaningful at all: our
  * own just-finished 32-thread pass leaves a decaying self-load tail in
  * the 1-min average, so an unsettled reading conflates self and
  * external load. A pass whose sentinel still exceeds the threshold
  * after the wait (external contention that outlasted it) is SPIKED:
  * excluded from the min and replaced from a bounded budget, the
  * Bench.collectPasses discipline. Per-size sentinel arrays land in
  * the record, so "every kept pass ran under threshold" is checkable
  * from the JSON alone:
  *
  * {{{ "isolated": {"x71_triangle_cc": {"t10": …, "t20": …,
  *     "ratio": 1.97, "beta2": 0.98, "load_max": 0.8,
  *     "loads_x10": [..], "loads_x20": [..],
  *     "spiked_x10": [..], "spiked_x20": [..]}, …} }}}
  *
  * Knobs: SPARK_GRAFT_LOAD_OK (sentinel threshold, default 4.0),
  * SPARK_GRAFT_LOAD_WAIT (max settle seconds per pass, default 150 —
  * must outlast the ~60 s self-load decay constant),
  * SPARK_GRAFT_PROBE_REPLACE (replacement budget per size cell,
  * default 2).
  *
  * Usage: SPARK_DRIVER_MEM=24g sbt "Test/runMain graft.IsoProbe
  *   [/tmp/scaledata] [passes] [10,20] [rowsCsv] [outPath]"
  * (24g per SCALE.md's measured-clean config — at the default 8 GiB the
  * 20× cells of the heavy rows re-measure heap pressure, which is
  * exactly what this probe exists to exclude; a smaller heap logs a
  * warning and proceeds.)
  */
object IsoProbe {

  val DefaultRows: Seq[String] =
    Seq("x71_triangle_cc", "x46_part_pagerank")

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/scaledata")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val mults = args.lift(2).getOrElse("10,20")
      .split(",").map(_.trim.toInt).toSeq.sorted
    require(mults.length == 2 && mults(1) == 2 * mults(0),
      s"IsoProbe reads a DOUBLING: need exactly two sizes m,2m, got " +
        mults.mkString(","))
    val rows = args.lift(3)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultRows)
    val outPath = args.lift(4).getOrElse("/root/repo/scale_exp_refit.json")
    val loadOk =
      sys.env.get("SPARK_GRAFT_LOAD_OK").map(_.toDouble).getOrElse(4.0)
    val loadWaitSec =
      sys.env.get("SPARK_GRAFT_LOAD_WAIT").map(_.toInt).getOrElse(150)
    val replaceCap =
      sys.env.get("SPARK_GRAFT_PROBE_REPLACE").map(_.toInt).getOrElse(2)
    require(loadOk > 0 && loadWaitSec >= 0 && replaceCap >= 0)
    if (HarnessSession.smallHeap)
      println("[isoprobe] WARNING: heap < 20 GiB — SCALE.md's clean " +
        "config is SPARK_DRIVER_MEM=24g; smaller heaps can re-measure " +
        "the suite's heap pressure instead of the algorithm")

    def session(): SparkSession = HarnessSession.build()

    // generate the datasets once, before any timed session
    locally {
      val s = session()
      mults.foreach(m => ScaleGen.write(s, s"$base/x$m", m))
      s.stop()
    }

    // 1-minute load average — sampled AFTER settle(), so the reading is
    // the external-contention sentinel, not our own decaying self-load
    // (this box takes external spikes to load-avg 20+ with none of our
    // JVMs running — BASELINE.md's standing host-band note).
    def load1(): Double =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }

    // Bounded settle: poll until the sentinel clears loadOk or the wait
    // budget elapses; returns the final reading (the pass's sentinel).
    def settle(): Double = {
      val deadline = System.nanoTime() + loadWaitSec * 1000000000L
      var l = load1()
      while (l > loadOk && l >= 0.0 && System.nanoTime() < deadline) {
        Thread.sleep(5000)
        l = load1()
      }
      l
    }

    val results = rows.map { q =>
      val s = session() // fresh session per row: no neighbor state
      // warm at the SMALLER size (plans, codegen, JIT)
      Caches.scope(s)(SparkEntry.queries(q)(s, s"$base/x${mults.head}")
        .count())
      s.catalog.clearCache()
      // (min over clean passes, all (dt, sentinel) in run order) per size
      val cells = mults.map { m =>
        val obs = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
        def onePass(): Unit = {
          val l = settle()
          val t0 = System.nanoTime()
          Caches.scope(s)(SparkEntry.queries(q)(s, s"$base/x$m").count())
          val dt = (System.nanoTime() - t0) / 1e9
          s.catalog.clearCache()
          val tag = if (l > loadOk) " SPIKED" else ""
          println(f"[isoprobe] $q x$m pass ${obs.size + 1} $dt%7.2f s " +
            f"(sentinel $l%.1f)$tag")
          obs += ((dt, l))
        }
        (1 to passes).foreach(_ => onePass())
        // detect-replace-exclude (the Bench discipline): a pass whose
        // settled sentinel still exceeded the threshold ran under
        // external contention — replace it from the bounded budget
        var extra = 0
        def clean = obs.count { case (_, l) => l >= 0.0 && l <= loadOk }
        while (clean < passes && extra < replaceCap) {
          onePass()
          extra += 1
        }
        val keptDts = obs.collect {
          case (dt, l) if l >= 0.0 && l <= loadOk => dt }
        val allClean = keptDts.size == obs.size
        // budget exhausted with zero clean passes: fall back to the min
        // over everything rather than record nothing — the per-pass
        // sentinel arrays make the degradation visible in the JSON
        val minDt = if (keptDts.nonEmpty) keptDts.min else obs.map(_._1).min
        if (!allClean && keptDts.isEmpty)
          println(s"[isoprobe] WARNING: $q x$m kept 0 clean passes — " +
            "min falls back to the spiked sweep (degraded cell)")
        (m, minDt, obs.toSeq)
      }
      s.stop()
      val mins = cells.map(_._2)
      val ratio = mins(1) / mins(0)
      val beta2 = math.log(ratio) / math.log(2.0)
      // load_max = the worst sentinel among KEPT passes — the "every
      // kept pass ran under threshold" claim as one number
      val keptLoads = cells.flatMap(_._3.collect {
        case (_, l) if l >= 0.0 && l <= loadOk => l })
      val loadMax = if (keptLoads.nonEmpty) keptLoads.max else -1.0
      println(f"[isoprobe] $q%-28s t${mults.head}=${mins(0)}%.2f " +
        f"t${mults(1)}=${mins(1)}%.2f ratio=$ratio%.2f beta2=$beta2%.2f " +
        f"load_max=$loadMax%.1f")
      q -> (mins, ratio, beta2, loadMax, cells)
    }

    val block = results.map {
      case (q, (mins, ratio, beta2, loadMax, cells)) =>
        val perSize = cells.map { case (m, _, obs) =>
          val loads = obs.map(o => f"${o._2}%.2f").mkString("[", ",", "]")
          val spiked = obs.zipWithIndex.collect {
            case ((_, l), i) if !(l >= 0.0 && l <= loadOk) => i }
            .mkString("[", ",", "]")
          s""""loads_x$m":$loads,"spiked_x$m":$spiked"""
        }.mkString(",")
        f""""$q":{"t${mults.head}":${mins(0)}%.3f,""" +
          f""""t${mults(1)}":${mins(1)}%.3f,""" +
          f""""ratio":$ratio%.3f,"beta2":$beta2%.3f,""" +
          f""""load_max":$loadMax%.2f,$perSize}"""
    }.mkString("{", ",", "}")
    val p = java.nio.file.Paths.get(outPath)
    val existing =
      if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p)
      else "{}"
    java.nio.file.Files.writeString(p,
      JsonMerge.setTopLevelKey(existing, "isolated", block))
    println(s"[isoprobe] merged 'isolated' block into $outPath")
  }
}
