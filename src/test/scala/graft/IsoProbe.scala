package graft

import org.apache.spark.sql.SparkSession

/** Per-round recorder for the ISOLATED doubling probes (r11 verdict #3).
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
  * merge into the refit record as a top-level `isolated` block:
  *
  * {{{ "isolated": {"x71_triangle_cc": {"t10": …, "t20": …,
  *     "ratio": 1.97, "beta2": 0.98}, …} }}}
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

    // 1-minute load average BEFORE a pass starts — our own 32-thread
    // run inflates it DURING the pass, so the pre-pass reading is the
    // external-contention sentinel. Recorded per row as load_max so a
    // spiked probe window is visible in the record itself (this box
    // takes external spikes to load-avg 20+ with none of our JVMs
    // running — BASELINE.md's standing host-band note).
    def load1(): Double =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }

    val results = rows.map { q =>
      val s = session() // fresh session per row: no neighbor state
      // warm at the SMALLER size (plans, codegen, JIT)
      Caches.scope(s)(SparkEntry.queries(q)(s, s"$base/x${mults.head}")
        .count())
      s.catalog.clearCache()
      var loadMax = -1.0
      val mins = mults.map { m =>
        val ts = (1 to passes).map { p =>
          val l = load1()
          loadMax = math.max(loadMax, l)
          val t0 = System.nanoTime()
          Caches.scope(s)(SparkEntry.queries(q)(s, s"$base/x$m").count())
          val dt = (System.nanoTime() - t0) / 1e9
          s.catalog.clearCache()
          println(f"[isoprobe] $q x$m pass $p $dt%7.2f s (pre-pass load $l%.1f)")
          dt
        }
        ts.min
      }
      s.stop()
      val ratio = mins(1) / mins(0)
      val beta2 = math.log(ratio) / math.log(2.0)
      println(f"[isoprobe] $q%-28s t${mults.head}=${mins(0)}%.2f " +
        f"t${mults(1)}=${mins(1)}%.2f ratio=$ratio%.2f beta2=$beta2%.2f " +
        f"load_max=$loadMax%.1f")
      q -> (mins, ratio, beta2, loadMax)
    }

    val block = results.map { case (q, (mins, ratio, beta2, loadMax)) =>
      f""""$q":{"t${mults.head}":${mins(0)}%.3f,""" +
        f""""t${mults(1)}":${mins(1)}%.3f,""" +
        f""""ratio":$ratio%.3f,"beta2":$beta2%.3f,""" +
        f""""load_max":$loadMax%.2f}"""
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
