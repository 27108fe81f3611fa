package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only per-query cost breakdown (not part of the declared surface):
  * splits a registry query's wall time into plan construction (builder
  * call — includes any count()/checkpoint jobs the builder runs
  * eagerly), and the terminal action, while a listener counts jobs,
  * stages, tasks and sums executor task time. Driver-side overhead =
  * wall − (task time / slots) is the quantity the optimization round
  * needs to see per query: a query whose wall is mostly un-parallelized
  * residue is bounded by planning/dispatch, not by the operators.
  *
  *   SPARK_GRAFT_CPUS=32 ProfDetail <sfDir> q1 q2 ...
  */
object ProfDetail {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
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
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
      }
    })
    // warm-up at the smallest SF, as Bench does
    names.foreach { n =>
      try Caches.scope(spark)(
        SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    println(f"${"query"}%-28s ${"wall"}%7s ${"build"}%7s ${"act"}%7s " +
      f"${"jobs"}%5s ${"stg"}%5s ${"tsk"}%6s ${"taskS"}%8s ${"resid"}%7s")
    names.foreach { n =>
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      try {
        Caches.scope(spark) {
          val df = SparkEntry.queries(n)(spark, dir)
          val t1 = System.nanoTime()
          df.count()
          val t2 = System.nanoTime()
          val wall = (t2 - t0) / 1e9
          val build = (t1 - t0) / 1e9
          val act = (t2 - t1) / 1e9
          val ts = taskMs.get() / 1e3
          val resid = wall - ts / cpus.toDouble
          println(f"$n%-28s $wall%7.2f $build%7.2f $act%7.2f " +
            f"${jobs.get()}%5d ${stages.get()}%5d ${tasks.get()}%6d " +
            f"$ts%8.2f $resid%7.2f")
        }
      } catch { case e: Throwable =>
        println(s"$n FAILED: ${e.getMessage.take(100)}") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
