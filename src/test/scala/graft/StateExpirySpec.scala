package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** State-store EVICTION pin for the watermark-bounded stateful
  * operators: the st-rows prove drained output equals the batch oracle,
  * but a state store that never frees rows would pass those checks too
  * — and at firehose scale, never-freed state IS the failure. This spec
  * drives st05's session assembly and the bounded dedup through ≥3
  * explicit micro-batches with late rows straddling the watermark
  * (older than events already seen, younger than the watermark — so
  * they are ADMITTED, the semantics-preserving kind of late), then
  * asserts from the progress metrics that state rows were actually
  * REMOVED as the watermark passed, that the final state holds only the
  * genuinely open groups, and that the emitted rows equal the
  * closed-region oracle computed by hand.
  */
class StateExpirySpec extends SparkSpec {

  private def t(hhmm: String) =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  /** Sum of a state-operator metric across every progress event. */
  private def stateMetric(
      q: org.apache.spark.sql.streaming.StreamingQuery,
      f: org.apache.spark.sql.streaming.StateOperatorProgress => Long)
      : Long =
    q.recentProgress.flatMap(_.stateOperators.map(f)).sum

  private def lastTotal(
      q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)
      .getOrElse(-1L)

  test("st05 session state evicts as the watermark passes: rows " +
      "removed per batch, only the open tail left, output == oracle") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val q = streaming.EventStream
      .timeoutSessions(ms.toDF().toDF("user_id", "ts"))
      .toDF()
      .writeStream.format("memory").queryName("expiry05")
      .outputMode("append").start()
    try {
      // batch 1: u1's session (00:00-00:10) + u2 at 02:00
      //   → watermark after the batch = 01:00; u1 closed at 00:40,
      //     so its state times out and EMITS
      ms.addData((1L, t("00:00")), (1L, t("00:10")), (2L, t("02:00")))
      q.processAllAvailable()
      // batch 2: u3 at 01:30 — LATE (older than u2's 02:00) but above
      // the 01:00 watermark, so admitted — + u4 at 04:00
      //   → watermark 03:00; u2 (closes 02:30) and u3 (02:00) emit
      ms.addData((3L, t("01:30")), (4L, t("04:00")))
      q.processAllAvailable()
      // batch 3: u5 at 03:30 (late again, admitted) + u6 at 06:00
      //   → watermark 05:00; u4 (04:30) and u5 (04:00) emit; u6 open
      ms.addData((5L, t("03:30")), (6L, t("06:00")))
      q.processAllAvailable()
      // eviction actually happened, batch by batch — 5 closed groups
      // left the store; only u6's open session remains
      assert(stateMetric(q, _.numRowsRemoved) == 5L,
        q.recentProgress.map(_.stateOperators.map(s =>
          (s.numRowsTotal, s.numRowsRemoved)).mkString).mkString(" | "))
      assert(lastTotal(q) == 1L, s"state not drained: ${lastTotal(q)}")
      // emitted rows = the hand-computed closed region (u6 still open)
      val got = spark.table("expiry05")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.get(1).toString.take(19),
          r.get(2).toString.take(19), r.getLong(3))).toSet
      val expected = Set(
        (1L, "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2L),
        (2L, "2024-01-01 02:00:00", "2024-01-01 02:00:00", 1L),
        (3L, "2024-01-01 01:30:00", "2024-01-01 01:30:00", 1L),
        (4L, "2024-01-01 04:00:00", "2024-01-01 04:00:00", 1L),
        (5L, "2024-01-01 03:30:00", "2024-01-01 03:30:00", 1L))
      assert(got == expected, s"got $got")
    } finally q.stop()
  }

  test("bounded dedup state evicts as the watermark passes and the " +
      "final store holds only unexpired keys") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = streaming.EventStream.dedupKeysWithinWatermark(
        ms.toDF().toDF("user_id", "event_type", "ts"),
        Seq("user_id", "event_type"), "10 minutes")
      .writeStream.format("memory").queryName("expiry06")
      .outputMode("append").start()
    try {
      // batch 1: two keys → wm = 00:00 - 10 min (still epoch floor)
      ms.addData((1L, "a", t("00:00")), (2L, "b", t("00:01")))
      q.processAllAvailable()
      // batch 2: a LATE duplicate of key 1 (00:05, admitted, dropped
      // as dup) + a far event pushing wm to 01:50 — both batch-1 keys
      // expire (00:00/00:01 + 10 min < 01:50)
      ms.addData((1L, "a", t("00:05")), (9L, "z", t("02:00")))
      q.processAllAvailable()
      // batch 3: key 1 re-arrives after expiry → re-emits (bounded
      // semantics), key 9 still live → deduped
      ms.addData((1L, "a", t("02:01")), (9L, "z", t("02:02")))
      q.processAllAvailable()
      assert(stateMetric(q, _.numRowsRemoved) >= 2L,
        q.recentProgress.map(_.stateOperators.map(s =>
          (s.numRowsTotal, s.numRowsRemoved)).mkString).mkString(" | "))
      // final store: key 1 (02:01) + key 9 (02:00) — the expired
      // batch-1 rows are gone
      assert(lastTotal(q) == 2L, s"state not bounded: ${lastTotal(q)}")
      val got = spark.table("expiry06")
        .groupBy("user_id", "event_type").count().collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == Map((1L, "a") -> 2L, (2L, "b") -> 1L,
        (9L, "z") -> 1L), got.toString)
    } finally q.stop()
  }
}
