package graft.operators

import graft.QueryDef

/** Declared multimodal queries — see [[Multimodal]] for the plumbing. */
object MultimodalQueries {

  def defs: Map[String, QueryDef] = Map(
    "mm01_binary_features" -> QueryDef(
      (s, d) => Multimodal.features(s, d),
      Some("""SELECT doc_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              md5(text) AS content_md5,
              CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_cp,
              1 + octet_length(encode(text)) % 640 AS fake_width,
              1 + octet_length(encode(text)) % 480 AS fake_height,
              1 + octet_length(encode(text)) % 24 AS n_frames
              FROM documents ORDER BY doc_id"""),
      "binary column + mapPartitions typed decode (stubbed codec)"),

    "mm02_frame_sample" -> QueryDef(
      (s, d) => Multimodal.frameSamples(s, d),
      Some("""WITH f AS (
              SELECT doc_id,
                1 + octet_length(encode(text)) % 24 AS n_frames,
                1 + octet_length(encode(text)) % 640 AS fake_width,
                1 + octet_length(encode(text)) % 480 AS fake_height
              FROM documents)
              SELECT doc_id,
                unnest(generate_series(0, n_frames - 1, 4)) AS frame_idx,
                least(fake_width, 224) AS thumb_w,
                least(fake_height, 224) AS thumb_h
              FROM f ORDER BY doc_id, frame_idx"""),
      "frame sampling + resize fan-out (explode per sampled frame)"),

    // ── Image-dedup shape over the media column: banded Hamming join on
    // the (stubbed) perceptual hash — see [[Multimodal.phashNearDup]].
    "mm03_phash_neardup" -> QueryDef(
      (s, d) => Multimodal.phashNearDup(s, d),
      Some("""WITH h AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(substr(text, 1, 64)), 1, 15)) AS BIGINT) AS ph
  FROM documents
),
bands AS (
  SELECT doc_id, ph, bi, (ph >> (bi * 15)) & 32767 AS bv
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS bi) bb
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv
  AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.ph, b.ph)) <= 3
ORDER BY doc_a, doc_b"""),
      "perceptual-hash near-dup over binary payloads (banded Hamming)"),

    // ── Audio shape: duration-proportional window decode + VAD
    // segmentation — see [[Multimodal.audioWindows]]/[[audioVad]].
    "mm04_audio_vad" -> QueryDef(
      (s, d) => Multimodal.audioVad(s, d),
      Some("""
WITH cps AS (
  SELECT doc_id, i, unicode(substring(text, CAST(i AS INT), 1)) AS cp
  FROM documents, unnest(generate_series(1, length(text))) AS t(i)
  WHERE length(text) > 0
),
win AS (
  SELECT doc_id, CAST((i - 1) // 16 AS BIGINT) AS w,
         CAST(sum(cp * cp) AS BIGINT) AS e, CAST(count(*) AS BIGINT) AS ns
  FROM cps GROUP BY 1, 2
),
flag AS (SELECT doc_id, w, (e >= 5000 * ns) AS voiced FROM win),
runs AS (
  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS run_len FROM (
    SELECT doc_id, w,
      w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS g
    FROM flag WHERE voiced
  ) GROUP BY 1, 2
),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        CAST(count(*) FILTER (WHERE voiced) AS BIGINT) AS n_voiced
        FROM flag GROUP BY 1),
rs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
       CAST(max(run_len) AS BIGINT) AS max_run FROM runs GROUP BY 1)
SELECT doc_id, n_windows, n_voiced,
  coalesce(n_segments, 0) AS n_segments,
  coalesce(max_run, 0) AS max_run
FROM agg LEFT JOIN rs USING (doc_id) ORDER BY doc_id"""),
      "windowed energy + voice-activity segmentation over decoded audio"))
}
