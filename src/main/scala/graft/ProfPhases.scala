package graft

import org.apache.spark.sql.SparkSession

/** Dev-only driver-cost probe (not part of the declared surface):
  * (a) pure job-dispatch latency on this host (empty 32-task jobs),
  * (b) per-query QueryPlanningTracker phases (parsing/analysis/
  * optimization/planning) for the terminal count, measured on a
  * SECOND run of the same query so codegen/JIT are warm and the
  * numbers isolate per-invocation driver work.
  */
object ProfPhases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // (a) dispatch floor: empty jobs, 32 tasks each
    val sc = spark.sparkContext
    val empty = sc.parallelize(1 to 32, 32)
    empty.count() // warm
    val t0 = System.nanoTime()
    (1 to 50).foreach(_ => empty.count())
    println(f"[dispatch] empty 32-task job: ${(System.nanoTime() - t0) / 50 / 1e6}%.1f ms")
    // (b) phases per query, second run
    names.foreach { n =>
      try Caches.scope(spark)(
        SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      (1 to 2).foreach { pass =>
        Caches.scope(spark) {
          val w0 = System.nanoTime()
          val df = SparkEntry.queries(n)(spark, dir)
          val w1 = System.nanoTime()
          // force analysis + optimization + physical planning (pre-AQE)
          df.queryExecution.executedPlan
          val w2 = System.nanoTime()
          df.count()
          val w3 = System.nanoTime()
          val ph = df.queryExecution.tracker.phases
            .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }
            .mkString(" ")
          println(f"[phases] $n pass$pass wall=${(w3 - w0) / 1e9}%.2f " +
            f"build=${(w1 - w0) / 1e9}%.2f plan=${(w2 - w1) / 1e9}%.2f " +
            f"exec=${(w3 - w2) / 1e9}%.2f  $ph")
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
