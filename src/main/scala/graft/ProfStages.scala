package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only per-stage trace (not part of the declared surface): for one
  * query run, print every stage's wall duration, task count, and summed
  * executor run time — the view that separates "few giant serial tasks"
  * from "many tiny tasks" from "dispatch gaps between stages".
  */
object ProfStages {
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
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        val run = i.taskMetrics.executorRunTime
        buf.add(f"  stage ${i.stageId}%4d tasks=${i.numTasks}%3d " +
          f"wall=${wall}%5d ms run=${run}%6d ms  ${i.name.take(70)}")
      }
    })
    names.foreach { n =>
      try Caches.scope(spark)(
        SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      buf.clear()
      val t0 = System.nanoTime()
      Caches.scope(spark)(SparkEntry.queries(n)(spark, dir).count())
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(300) // let listener drain
      println(f"== $n wall=$wall%.2f s, ${buf.size} stages")
      buf.forEach(l => println(l))
    }
    spark.stop()
  }
}
