package graft

import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Loaded-window forensics for the token-LM family (the r10 verdict's
  * #1 ask): x36/x39/x92/x93 are the repeat victims whenever a driver
  * bench window is loaded (r10: 1.8-4.1× their builder medians while
  * quiet mins stayed flat). This main REPRODUCES the inflation under
  * controlled synthetic co-residency and splits the mechanism three
  * ways per (query, mode) cell:
  *
  *   - mode `none`  — quiet floor;
  *   - mode `spin`  — N background threads in a pure arithmetic spin
  *     loop (CPU steal, ZERO allocation): inflation here is scheduler
  *     contention any query would see in proportion;
  *   - mode `alloc` — N background threads allocating and dropping
  *     short-lived arrays (young-gen pressure): inflation here BEYOND
  *     the spin ratio is allocation/GC coupling — the co-resident does
  *     not take the victim's CPU between its safepoints, it fills the
  *     shared young gen so the victim's own allocation-heavy stages
  *     pay extra collections.
  *
  * Controls (a01 columnar agg, j05 multiway join, x05 hash dedup) have
  * ordinary allocation rates; if the LM rows' alloc-mode ratio exceeds
  * the controls' while spin-mode ratios match, the family's documented
  * sensitivity is allocation-bound, not scheduling-bound.
  *
  * Per cell: median + min wall seconds, JVM-wide ΔGC ms, Δ codegen
  * compilations (CodegenMetrics — the cache-miss counter), and Δ JIT
  * compilation ms — the candidate mechanisms measured, not argued.
  *
  * Usage: sbt "Test/runMain graft.LoadProf [sfDir] [passes] [threads]
  *   [rowsCsv] [codegenCacheEntries]" — runs all three modes and
  * writes `loadprof_c<cacheEntries>.json` (the record names its
  * independent variable, so the cache-100 control and the cache-8192
  * treatment coexist on disk). `SPARK_GRAFT_ISOLATION` flips
  * `spark.sql.artifact.isolation.enabled` (default false, the
  * engine's production setting).
  */
object LoadProf {

  val DefaultRows: Seq[String] = Seq(
    // victims
    "x36_unigram_logprob", "x39_bigram_logprob",
    "x92_bpe_fertility", "x93_kneser_ney",
    // controls
    "a01_group_sum_max", "j05_multiway_join", "x05_dedup_exact")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val nThreads = args.lift(2).map(_.toInt).getOrElse(16)
    val rows = args.lift(3)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultRows)
    // STATIC conf (must precede session creation in this JVM): the
    // experiment's independent variable — default 100 entries thrashes
    // when a registry of hundreds of queries cycles, forcing fresh
    // Janino + HotSpot compilation of every generated class every pass
    val codegenCache = args.lift(4).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", codegenCache)
      .config("spark.sql.artifact.isolation.enabled",
        sys.env.getOrElse("SPARK_GRAFT_ISOLATION", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gcBeans = ManagementFactory.getGarbageCollectorMXBeans.asScala
    val jit = ManagementFactory.getCompilationMXBean
    def gcMs(): Long = gcBeans.map(_.getCollectionTime).sum
    // Janino compilations actually RUN (codegen-cache misses): the
    // direct cache-thrash measure, immune to host-window drift
    val cgen = org.apache.spark.metrics.source.CodegenMetrics
    def janinoN(): Long = cgen.METRIC_SOURCE_CODE_SIZE.getCount

    // one measurement: (wall s, ΔGC ms, Δcodegen compiles, ΔJIT ms)
    def cell(q: String): (Double, Long, Long, Long) = {
      val (g0, c0, j0) = (gcMs(), janinoN(), jit.getTotalCompilationTime)
      val t0 = System.nanoTime()
      Caches.scope(spark)(SparkEntry.queries(q)(spark, dir).count())
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (dt, gcMs() - g0, janinoN() - c0, jit.getTotalCompilationTime - j0)
    }

    // background co-residents; stop flag checked every iteration
    def withLoad[A](mode: String)(body: => A): A = {
      val stop = new AtomicBoolean(false)
      val threads = mode match {
        case "none" => Seq.empty
        case "spin" => (1 to nThreads).map { i =>
          new Thread(() => {
            var x = i.toLong
            while (!stop.get()) { // pure arithmetic, zero allocation
              var k = 0
              while (k < 100000) { x = x * 6364136223846793005L + 1442695040888963407L; k += 1 }
            }
            if (x == 42L) println("") // keep x live
          }, s"loadprof-spin-$i")
        }
        case "alloc" => (1 to nThreads).map { i =>
          new Thread(() => {
            var sink = 0L
            while (!stop.get()) {
              // short-lived garbage in the shapes the executor makes:
              // small strings and arrays, dropped immediately
              var k = 0
              while (k < 2000) {
                val a = new Array[Byte](64 + (k % 192))
                a(k % a.length) = k.toByte
                val s = new String(a, 0, a.length,
                  java.nio.charset.StandardCharsets.ISO_8859_1)
                sink += s.length
                k += 1
              }
            }
            if (sink == -1L) println("")
          }, s"loadprof-alloc-$i")
        }
        case other =>
          throw new IllegalArgumentException(s"unknown mode $other")
      }
      threads.foreach { t => t.setDaemon(true); t.start() }
      try body
      finally { stop.set(true); threads.foreach(_.join(2000)) }
    }

    // JIT/plan warm-up: every row once, quiet, at the target dir
    rows.foreach(cell)

    val modes = Seq("none", "spin", "alloc")
    val out = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), Seq[(Double, Long, Long, Long)]]
    for (mode <- modes) {
      withLoad(mode) {
        for (p <- 1 to passes; q <- rows) {
          val m = cell(q)
          out((q, mode)) = out.getOrElse((q, mode), Nil) :+ m
          println(f"[loadprof] pass $p $mode%-5s $q%-24s ${m._1}%6.2f s " +
            f"gc=${m._2}%5d ms cgen=${m._3}%3d jit=${m._4}%5d ms")
        }
      }
    }
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2 // even passes: midpoint
    }
    println(f"[loadprof] ${"query"}%-24s " + modes.map(m =>
      f"$m%-28s").mkString(" ") +
      "  (med s / min s / gc ms / cgen / jit ms)")
    val json = rows.map { q =>
      val cells = modes.map { m =>
        val ms = out((q, m))
        (med(ms.map(_._1)), ms.map(_._1).min,
          ms.map(_._2).sum / ms.size, ms.map(_._3).sum / ms.size,
          ms.map(_._4).sum / ms.size)
      }
      println(f"[loadprof] $q%-24s " + cells.map { case (a, b, g, c, j) =>
        f"$a%5.2f/$b%5.2f/$g%5d/$c%4d/$j%5d" }.mkString("  "))
      val fields = modes.zip(cells).map { case (m, (a, b, g, c, j)) =>
        f""""${m}_med":$a%.3f,"${m}_min":$b%.3f,"${m}_gc_ms":$g""" +
          f""","${m}_cgen":$c,"${m}_jit_ms":$j"""
      }.mkString(",")
      s""""$q":{$fields}"""
    }.mkString("{", ",", "}")
    // the record names its independent variable so the cache-100
    // control and the cache-8192 treatment coexist on disk
    val path = s"/root/repo/loadprof_c$codegenCache.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
    println(s"[loadprof] wrote $path")
    spark.stop()
  }
}
