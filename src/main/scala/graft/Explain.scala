package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named registry
  * queries (or every query when none are named) against a given SF dir
  * — the `.explain("formatted")` audit loop as a one-liner:
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.001 x08c_jaccard_dfcap"
  *
  * Not part of the driver contract; used to keep plan shapes honest
  * (PushedFilters reaching scans, broadcast vs shuffle joins, whole-
  * stage codegen spans) while iterating.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          try fn(spark, dir).explain("formatted")
          catch { case e: Throwable =>
            println(s"[explain] $n failed: ${e.getMessage}") }
        case None => println(s"[explain] unknown query: $n")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
