package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR and
  * reports one JSON object two ways:
  *
  *   1. full precision to `/root/repo/bench_out.json` (machine-readable
  *      regardless of how stdout is captured), and
  *   2. a compact (2-decimal) single line as the FINAL stdout line — the
  *      driver's log capture keeps only a bounded tail, so the line is
  *      kept short and nothing may print after it (build.sbt sets
  *      `showSuccess := false` so sbt's own trailer doesn't follow it).
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
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir =
      sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // warm-up: every query once at the smallest SF (plans, codegen, JIT,
    // streaming machinery), then a clean slate for the timed pass
    ordered.foreach { case (_, fn) =>
      try fn(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (name, dt, ok)
    }
    val total = results.collect { case (_, dt, true) => dt }.sum
    val errors = results.collect { case (n, _, false) => n }
    def render(fmt: Double => String): String = {
      val qs = results
        .map { case (n, dt, ok) => s"\"$n\":" + fmt(if (ok) dt else -dt) }
        .mkString("{", ",", "}")
      val errs =
        if (errors.isEmpty) ""
        else errors.mkString(",\"errors\":[\"", "\",\"", "\"]")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec"""" +
        s""","queries":$qs$errs,"sf":"$sfDir"}"""
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/bench_out.json"),
      render(_.toString).getBytes("UTF-8"))
    spark.stop()
    // compact spelling, LAST line: %.2f, strip the trailing zero of x.x0
    println(render(d => f"$d%.2f".stripSuffix("0") match {
      case s if s.endsWith(".") => s + "0"
      case s                    => s
    }))
  }
}
