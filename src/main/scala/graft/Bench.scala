package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries run in sorted name order after a session
  * warm-up pass (table listing + codegen infra), so per-query numbers
  * measure the query, not first-touch JVM costs; the cache is cleared
  * between queries so persisted intermediates can't subsidize a later one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: touch every table (footer reads, filesystem listing) and one
    // small shuffle so codegen/exchange machinery is JIT-compiled
    QueryDef.tableNames.foreach { t =>
      try Tables.byName(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    Tables.orders(spark, sfDir).groupBy("o_orderstatus").count().count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
