package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val warm = "/root/testdata/sf0.001"
    for (q <- Seq("x41_embed_dedup_clusters", "x64_cluster_purity"))
      SparkEntry.queries(q)(spark, warm).count()
    spark.catalog.clearCache()
    time("x41_full") {
      SparkEntry.queries("x41_embed_dedup_clusters")(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    time("x64_full") {
      SparkEntry.queries("x64_cluster_purity")(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    time("x42_full") {
      SparkEntry.queries("x42_cluster_canonical")(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
