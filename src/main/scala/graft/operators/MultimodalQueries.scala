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
              CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
              1 + octet_length(encode(text)) % 640 AS fake_width,
              1 + octet_length(encode(text)) % 480 AS fake_height,
              1 + octet_length(encode(text)) % 24 AS n_frames
              FROM documents ORDER BY doc_id"""),
      "binary column + mapPartitions typed decode (stubbed codec)"))
}
