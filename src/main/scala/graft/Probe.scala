package graft

import org.apache.spark.sql.SparkSession

/** Perf probe: time a named subset of declared queries, cold then warm,
  * in one JVM — separates per-query steady-state cost from first-touch
  * JIT/machinery cost before any optimization work (bench numbers on this
  * host fluctuate ±15%, so a single full-bench delta proves nothing).
  *
  * Usage: runMain graft.Probe <sfDir> <query...> [-n reps]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).filterNot(_.startsWith("-"))
    val reps = args.sliding(2).collectFirst {
      case Array("-n", n) => n.toInt }.getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"PROBE $name%-28s " +
        times.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
