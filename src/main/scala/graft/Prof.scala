package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (dev-only, not part of the declared surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm-up full query at sf0.001
    val warm = "/root/testdata/sf0.001"
    SparkEntry.queries("x10_ann_ivf_assign")(spark, warm).count()
    spark.catalog.clearCache()
    // staged timings at sfDir
    time("full_x10_cold") {
      SparkEntry.queries("x10_ann_ivf_assign")(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    time("full_x10_again") {
      SparkEntry.queries("x10_ann_ivf_assign")(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    time("full_x12") {
      SparkEntry.queries("x12_ann_ivf_search")(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    time("full_x11") {
      SparkEntry.queries("x11_embed_neardup")(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
