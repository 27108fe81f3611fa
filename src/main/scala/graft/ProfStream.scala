package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only streaming-drain cost probe (not part of the declared
  * surface): replicate EventStream.runToMemory around st12's aggregate
  * with per-step timing (plan build, query start, drain, stop,
  * localize) and per-batch durations from the progress events.
  */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    // warm both the batch plan pieces and the streaming machinery once
    try Caches.scope(spark)(
      SparkEntry.queries("st12_stream_curation_gate")(
        spark, "/root/testdata/sf0.001").count())
    catch { case _: Throwable => () }
    spark.catalog.clearCache()
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val kept = col("f1") && col("f2") && col("f3") && col("f4")
      val gate = graft.operators.TextQueries
        .rowLocalFlags(graft.streaming.EventStream.readDocuments(spark, dir))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs_in"),
          sum(when(kept, 1L).otherwise(0L)).as("docs_kept"),
          sum(col("n_tokens")).cast("bigint").as("tokens_in"),
          sum(when(kept, col("n_tokens")).otherwise(0L)).cast("bigint")
            .as("tokens_kept"))
      val t1 = System.nanoTime()
      val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
      spark.conf.set(ndKey, "false")
      val spKey = "spark.sql.shuffle.partitions"
      spark.conf.set(spKey, "8")
      val name = s"profst_${pass}_${System.nanoTime}"
      val q = gate.writeStream.outputMode("complete").format("memory")
        .queryName(name).trigger(Trigger.ProcessingTime(0)).start()
      val t2 = System.nanoTime()
      q.processAllAvailable()
      val t3 = System.nanoTime()
      val progress = q.recentProgress.map(p =>
        s"batch=${p.batchId} rows=${p.numInputRows} " +
          s"total=${p.durationMs.get("triggerExecution")}ms " +
          s"addBatch=${p.durationMs.get("addBatch")}ms " +
          s"getBatch=${p.durationMs.get("getBatch")}ms " +
          s"latestOffset=${p.durationMs.get("latestOffset")}ms " +
          s"queryPlanning=${p.durationMs.get("queryPlanning")}ms " +
          s"commit=${p.durationMs.get("commitOffsets")}ms " +
          s"walCommit=${p.durationMs.get("walCommit")}ms").mkString("\n  ")
      q.stop(); q.awaitTermination()
      val t4 = System.nanoTime()
      spark.conf.set(spKey, cpus)
      val sink = spark.table(name)
      val out = spark.createDataFrame(
        java.util.Arrays.asList(sink.collect(): _*), sink.schema)
      out.count()
      spark.catalog.dropTempView(name)
      val t5 = System.nanoTime()
      def s9(a: Long, b: Long) = f"${(b - a) / 1e9}%.2f"
      println(s"[st12 pass$pass] build=${s9(t0, t1)} start=${s9(t1, t2)} " +
        s"drain=${s9(t2, t3)} stop=${s9(t3, t4)} localize=${s9(t4, t5)} " +
        s"total=${s9(t0, t5)}\n  $progress")
    }
    spark.stop()
  }
}
