package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing: opaque binary payloads + typed feature
  * extraction via `mapPartitions` (SURVEY §2.10 extension).
  *
  * Real pipelines carry images/audio/video as `binary` columns and decode
  * them in a partition-local loop (one codec instance per partition, not
  * per row — the JVM twin of a `mapInPandas` batch UDF). The decoders
  * themselves aren't available in this environment, so `fakeDecode` is a
  * clearly-marked deterministic stand-in: the Spark-side plumbing —
  * schema, encoder, partition batching, per-partition resource reuse — is
  * the real, tested part. Swap `fakeDecode` for an actual codec and
  * nothing else changes.
  */
object Multimodal {

  /** An opaque binary payload keyed by document. */
  final case class BinaryDoc(doc_id: Long, content: Array[Byte])

  /** Typed decode output: payload stats + pseudo media metadata.
    * `first_cp` is the first Unicode code point of the decoded payload
    * (0 when empty) — code point, not raw byte, because the DuckDB oracle's
    * `ascii()` returns code points and the two must agree on non-ASCII.
    */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      content_md5: String,
      first_cp: Long,
      fake_width: Long,
      fake_height: Long,
      n_frames: Long)

  /** STUB decode — deterministic fake in place of an image/audio codec.
    * A real implementation would parse `content` (JPEG/WAV/MP4 headers);
    * the fake derives stable pseudo-dimensions from the byte length so
    * tests and the oracle can pin the plumbing end-to-end.
    */
  private def fakeDecode(md: java.security.MessageDigest,
      doc: BinaryDoc): MediaFeatures = {
    md.reset()
    val hex = md.digest(doc.content).map("%02x".format(_)).mkString
    val n = doc.content.length.toLong
    MediaFeatures(
      doc_id = doc.doc_id,
      n_bytes = n,
      content_md5 = hex,
      first_cp = {
        val s = new String(doc.content, java.nio.charset.StandardCharsets.UTF_8)
        if (s.isEmpty) 0L else s.codePointAt(0).toLong
      },
      fake_width = 1 + n % 640,
      fake_height = 1 + n % 480,
      n_frames = 1 + n % 24)
  }

  /** Partition-local decode: one MessageDigest (stand-in for one codec
    * context) per partition, streamed over the iterator — constant memory,
    * no driver involvement, parallel across input splits.
    */
  def decodeFeatures(docs: Dataset[BinaryDoc]): Dataset[MediaFeatures] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(fakeDecode(md, _))
    }
  }

  /** documents.text reinterpreted as a binary payload column. */
  def binaryDocs(spark: SparkSession, dir: String): Dataset[BinaryDoc] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "encode(text, 'UTF-8') AS content")
      .as[BinaryDoc]
  }

  def features(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(binaryDocs(spark, dir)).toDF().orderBy("doc_id")

  /** Frame sampling + thumbnail "resize" over the decoded metadata: every
    * 4th frame, dimensions clamped to 224. The explode is the real
    * multimodal fan-out shape (one row per sampled frame, scales with
    * output frames not input bytes); the arithmetic stands in for the
    * absent codec exactly like [[fakeDecode]].
    */
  def frameSamples(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    decodeFeatures(binaryDocs(spark, dir)).toDF()
      .select(col("doc_id"), col("n_frames"),
        col("fake_width"), col("fake_height"))
      .withColumn("frame_idx",
        explode(expr("sequence(CAST(0 AS BIGINT), n_frames - 1, CAST(4 AS BIGINT))")))
      .select(col("doc_id"), col("frame_idx"),
        least(col("fake_width"), lit(224L)).as("thumb_w"),
        least(col("fake_height"), lit(224L)).as("thumb_h"))
      .orderBy("doc_id", "frame_idx")
  }

  /** One fixed-size "audio" analysis window: exact integer energy
    * (Σ cp², no floats — cross-engine parity is trivially bit-exact)
    * over `ns` decoded samples.
    */
  final case class AudioWindow(doc_id: Long, w: Long, e: Long, ns: Long)

  /** Windows per decoded payload — the AUDIO decode shape: a codec
    * emits a duration-proportional stream of frames/windows, not one
    * row per file, so the fan-out happens INSIDE the partition-local
    * decode (the `mapInPandas` batch analog), scaling with media
    * seconds while the input stays one binary row. The stand-in
    * "PCM decode" reads the payload's Unicode code points as sample
    * amplitudes (deterministic, like [[fakeDecode]]'s dimensions —
    * swap in a real WAV/Opus decoder and the window stream, schema,
    * and downstream plan are unchanged). 16 samples per window;
    * empty payloads decode to zero windows on both engines.
    */
  def audioWindows(docs: Dataset[BinaryDoc]): Dataset[AudioWindow] = {
    import docs.sparkSession.implicits._
    docs.flatMap { doc =>
      val s = new String(doc.content, java.nio.charset.StandardCharsets.UTF_8)
      if (s.isEmpty) Iterator.empty
      else s.codePoints().toArray.grouped(16).zipWithIndex.map {
        case (g, w) => AudioWindow(doc.doc_id, w.toLong,
          g.map(c => c.toLong * c).sum, g.length.toLong)
      }
    }
  }

  /** Voice-activity segmentation over the window stream — the
    * silence-trim audit an audio curation pipeline runs before ASR:
    * a window is voiced when its mean energy clears a threshold
    * (exact integer comparison, `e ≥ 5000·ns`), voiced runs merge
    * into segments by gaps-and-islands (`w − row_number` per doc),
    * and each doc reports window/voiced/segment counts plus its
    * longest segment. The window stream is computed once and reused
    * by both branches (totals + islands); every shuffle is keyed on
    * `doc_id`, so at 100 TB this is one decode pass plus
    * doc-partitioned aggregation — no corpus-wide hot key.
    */
  def audioVad(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val flag = audioWindows(binaryDocs(spark, dir)).toDF()
      .withColumn("voiced", col("e") >= col("ns") * lit(5000L))
      .transform(graft.Caches.scoped)
    val agg = flag.groupBy("doc_id").agg(
      count(lit(1)).as("n_windows"),
      sum(when(col("voiced"), lit(1L)).otherwise(lit(0L))).as("n_voiced"))
    val runs = flag.filter(col("voiced"))
      .withColumn("g", col("w") -
        row_number().over(Window.partitionBy("doc_id").orderBy("w")))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("run_len"))
    val rs = runs.groupBy("doc_id").agg(
      count(lit(1)).as("n_segments"), max("run_len").as("max_run"))
    agg.join(rs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"), col("n_voiced"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
      .orderBy("doc_id")
  }

  /** Perceptual-hash near-dup over the binary payloads — the IMAGE-DEDUP
    * shape of a multimodal corpus pipeline (x13's banded-Hamming
    * machinery applied to the media column). A real pipeline computes a
    * 64-bit DCT pHash from the decoded luma plane; the codec is absent
    * here, so the hash stands in as 60 bits of the payload digest the
    * [[decodeFeatures]] pass already extracts (clearly-marked fake,
    * exactly like `fakeDecode`'s dimensions): byte-identical payloads
    * collide at distance 0, so the candidate/verify machinery — the
    * real, tested part — exercises end-to-end and swaps to a true pHash
    * with no plan change.
    *
    * The stand-in digests the first 64 code points of the decoded
    * payload (a "thumbnail" of the leading content — mm01's `first_cp`
    * code-point convention, so both engines slice identically under
    * multibyte text): payloads sharing their lead collide at distance 0,
    * which gives the candidate machinery real pairs on this corpus
    * (full-payload digests never collide here).
    *
    * Shape: 4 bands × 15 bits per hash; a pair within Hamming ≤ 3 MUST
    * agree on ≥ 1 band (pigeonhole), so only band-equal pairs enter the
    * join, and the exact `bit_count(xor)` test — carried WITH the band
    * rows, x13-style, so collisions die before the distinct — prunes the
    * rest. Never an all-pairs scan; per-band fan-out is bounded by
    * bucket population exactly like the LSH families (the same
    * cap levers would apply at scale).
    */
  def phashNearDup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val h = binaryDocs(spark, dir).toDF()
      .select(col("doc_id"), expr(
        """CAST(conv(substr(md5(substring(decode(content, 'UTF-8'), 1, 64)),
           1, 15), 16, 10) AS BIGINT)""").as("ph"))
    val bands = h.select(col("doc_id"), col("ph"),
        explode(expr("""transform(sequence(0, 3), i -> named_struct(
          'bi', i, 'bv', shiftright(ph, i * 15) & 32767))""")).as("bd"))
      .select(col("doc_id"), col("ph"),
        col("bd.bi").as("bi"), col("bd.bv").as("bv"))
    bands.as("a").join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.ph ^ b.ph) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }
}
