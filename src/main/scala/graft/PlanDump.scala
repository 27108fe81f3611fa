package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan dump for ad-hoc `.explain("formatted")` audits. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"=== $name ===")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
