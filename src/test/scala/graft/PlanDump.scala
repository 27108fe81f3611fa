package graft

import org.apache.spark.sql.SparkSession

/** Test-scope plan inspector: prints join/exchange node counts (and
  * optionally the full plan) for the named queries — the manual
  * `.explain("formatted")` audit loop as a one-liner.
  *
  * Usage: sbt "Test/runMain graft.PlanDump q1,q2 [full]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("e12_rfm_segments"))
    val full = args.length > 1 && args(1) == "full"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      val plan = df.queryExecution.sparkPlan.toString
      def c(p: String) = p.r.findAllIn(plan).size
      println(s"[plandump] $n: BroadcastHashJoin=${c("BroadcastHashJoin")} " +
        s"SortMergeJoin=${c("SortMergeJoin")} " +
        s"BroadcastNestedLoopJoin=${c("BroadcastNestedLoopJoin")} " +
        s"rangeExchange=${c("Exchange rangepartitioning")} " +
        s"hashExchange=${c("Exchange hashpartitioning")} " +
        s"singleExchange=${c("Exchange SinglePartition")} " +
        s"window=${c("Window")}")
      if (full) println(plan)
    }
    spark.stop()
  }
}
