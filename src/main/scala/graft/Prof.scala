package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (dev-only, not part of the declared surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.ensureInstalled(spark)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val q = args.headOption.getOrElse("x73_source_attribution")
    val dirs = args.drop(1) match {
      case a if a.nonEmpty => a.toSeq
      case _ => Seq("/root/testdata/sf0.1",
        "/tmp/scaledata/x1", "/tmp/scaledata/x4", "/tmp/scaledata/x10")
    }
    // warm the JVM/codegen on the tiny SF
    Caches.scope(spark)(
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count())
    spark.catalog.clearCache()
    for (p <- 1 to 2; d <- dirs) {
      time(s"$q pass$p $d") {
        Caches.scope(spark)(SparkEntry.queries(q)(spark, d).count())
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
