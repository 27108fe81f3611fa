package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming scaling measurement — the firehose counterpart of
  * [[ScaleExp]]: drains three representative stateful rows over the
  * [[ScaleGen]] events table at several size multipliers and reports,
  * per (row, size), the drain wall time AND the peak state-store row
  * count. The claim under test is the SCALE.md streaming rule: state is
  * bounded by the KEY space, never by events —
  *
  *   - st01 (windowed monoid agg): state = open windows × event types —
  *     the 30-day window span is FIXED in the generator, so state must
  *     stay ~constant while event density grows 10×;
  *   - st06 (dedup-at-ingest): state = distinct (user, event_type) keys
  *     — users scale with m, so state must grow with KEYS (m), and the
  *     drained row count says whether it did;
  *   - st09 (transformWithState, RocksDB): per-user composite state —
  *     same key-bounded shape on the other state-store provider;
  *   - st07 (stream-stream interval join): the one INTERVAL-bounded
  *     shape — each side buffers a watermark horizon's worth of
  *     events, so state grows with event DENSITY (∝ m, the honest
  *     design bound), never with history length.
  *
  * Wall time should read ~linear in events (the per-micro-batch work IS
  * event-proportional); what must NOT grow super-linearly is state.
  *
  * Usage: SPARK_DRIVER_MEM=24g sbt "Test/runMain graft.StreamScaleExp
  *   [/tmp/scaledata] [passes] [1,4,10]"
  * (24g = the measured-clean heap for 10×+ cells — ScaleExp's scaladoc
  * has the round-11 attribution; smaller heaps fold harness old-gen
  * pressure into the wall times.)
  */
object StreamScaleExp {

  val Rows: Seq[String] = Seq("st01_stream_tumbling", "st06_stream_dedup",
    "st09_transform_with_state", "st07_stream_stream_join")

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/scaledata")
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val mults = args.lift(2).getOrElse("1,4,10")
      .split(",").map(_.trim.toInt).toSeq
    val spark = HarnessSession.build()
    val dirs = mults.map(m => m -> s"$base/x$m")
    dirs.foreach { case (m, dir) => ScaleGen.write(spark, dir, m) }

    // the state probe: peak numRowsTotal across every progress event of
    // the CURRENT drain (queries run one at a time, so no attribution
    // ambiguity); reset per cell, flushed via the shared listener bus
    val peak = new AtomicLong(0)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = {}
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val ops = e.progress.stateOperators
        if (ops != null && ops.nonEmpty) {
          val tot = ops.map(_.numRowsTotal).sum
          var cur = peak.get()
          while (tot > cur && !peak.compareAndSet(cur, tot)) cur = peak.get()
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = {}
    }
    spark.streams.addListener(listener)
    def cell(q: String, dir: String): (Double, Long) = {
      peak.set(0)
      val t0 = System.nanoTime()
      Caches.scope(spark)(SparkEntry.queries(q)(spark, dir).count())
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      org.apache.spark.ListenerBusDrain.waitUntilEmpty(
        spark.sparkContext, 30000L)
      (dt, peak.get())
    }

    // try/finally: a drain that throws mid-run must still unregister
    // the listener and stop the session (a leaked listener would keep
    // accumulating peaks into dead state on a reused JVM)
    try {
      // warm-up at the smallest MULTIPLIER (micro-batch machinery,
      // codegen) — dirs.head is the smallest only when the mults
      // argument happens to be ascending
      val warmDir = dirs.minBy(_._1)._2
      Rows.foreach(q => cell(q, warmDir))
      val times = scala.collection.mutable.Map
        .empty[(String, Int), List[Double]].withDefaultValue(Nil)
      val states = scala.collection.mutable.Map
        .empty[(String, Int), Long].withDefaultValue(0L)
      for (p <- 1 to passes; (m, dir) <- dirs; q <- Rows) {
        val (dt, st) = cell(q, dir)
        times((q, m)) = dt :: times((q, m))
        states((q, m)) = math.max(states((q, m)), st)
        println(f"[streamscale] pass $p x$m%-2d $q%-26s $dt%7.2f s " +
          f"state=$st%,d rows")
      }
      println("[streamscale] query," + mults.flatMap(m =>
        Seq(s"t${m}_min_s", s"state$m")).mkString(","))
      val json = Rows.map { q =>
        val cells = mults.map(m => (times((q, m)).min, states((q, m))))
        println(f"[streamscale] $q%-26s " + cells.map { case (t, st) =>
          f"$t%7.2f s ${st}%,d" }.mkString("  "))
        val tf = mults.zip(cells).map { case (m, (t, st)) =>
          f"""\"t$m\":$t%.3f,\"state$m\":$st""" }.mkString(",")
        s"""\"$q\":{$tf}"""
      }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/root/repo/scale_stream.json"), json)
      println(s"[streamscale] wrote /root/repo/scale_stream.json")
    } finally {
      spark.streams.removeListener(listener)
      spark.stop()
    }
  }
}
