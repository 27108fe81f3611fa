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
      "frame sampling + resize fan-out (explode per sampled frame)"))
}
