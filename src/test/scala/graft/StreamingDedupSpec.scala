package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Bounded-state streaming dedup: within the watermark delay a key emits
  * once; after its state expires the same key emits again. Batches are
  * driven explicitly because the semantics are exactly "what survived in
  * state when the duplicate arrived".
  */
class StreamingDedupSpec extends SparkSpec {

  test("dedupKeysWithinWatermark: dedup within delay, re-emit after expiry") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = Timestamp.valueOf("2001-01-01 00:00:00")
    def ts(min: Int) = new Timestamp(t0.getTime + min * 60000L)
    val ms = MemoryStream[(Long, String, Timestamp)]
    val q = streaming.EventStream.dedupKeysWithinWatermark(
        ms.toDF().toDF("user_id", "event_type", "ts"),
        Seq("user_id", "event_type"), "10 minutes")
      .writeStream.format("memory").queryName("wmdedup")
      .outputMode("append").start()
    try {
      // batch 1: duplicate inside the delay is dropped
      ms.addData((1L, "click", ts(0)), (1L, "click", ts(1)),
        (2L, "view", ts(0)))
      q.processAllAvailable()
      // batch 2: unrelated far-future event pushes the watermark to
      // +110 min, past (1,click)'s expiry at ts(0) + 10 min
      ms.addData((9L, "other", ts(120)))
      q.processAllAvailable()
      // batch 3: the expired key re-emits
      ms.addData((1L, "click", ts(121)))
      q.processAllAvailable()
      val out = spark.table("wmdedup")
        .groupBy("user_id", "event_type").count().collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(out == Map((1L, "click") -> 2L, (2L, "view") -> 1L,
        (9L, "other") -> 1L), out.toString)
    } finally q.stop()
  }
}
