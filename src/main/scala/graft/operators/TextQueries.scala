package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Money
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the language-ID /
  * quality-scoring / token-counting / fingerprinting surface an LLM
  * training-data pipeline runs before dedup and filtering. No reference
  * counterpart (extension per SURVEY §2.10); everything is built from
  * codegen-friendly string/array expressions — no UDFs — so the scans
  * stay inside whole-stage codegen and scale linearly with input splits.
  */
object TextQueries {
  import Money.sqlRound

  /** Per-language stopword lists for the n-gram/stopword heuristic. */
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "los", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "est"))

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ",", ")")

  /** The x02 quality computation (per-doc ratios + blended 0-100 score),
    * factored so x42's keep-best-per-cluster pick scores with EXACTLY
    * the x02 spelling — a drifted copy would silently rank clusters by
    * a different notion of quality. Returns documents plus n_tokens /
    * stop_ratio / uniq_ratio / mean_token_len / quality_score.
    */
  private[operators] def qualityScored(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    // spread BEFORE the per-row split/filter/distinct work: the corpus
    // arrives as one split at test SFs, so the scoring stage would run
    // as ONE serial task (measured 1.8 s of corpus_curate's 3.0 s at
    // sf0.1 — the whole flag computation on one core); the
    // documentsSpread trade (guide §2.5 input skew / Tables scaladoc)
    // applies to every text-expression-dense scan
    qualityScoredDf(Tables.documentsSpread(s, d))

  /** [[qualityScored]] over an arbitrary `documents`-shaped frame —
    * the same Column tree applied to batch reads AND streaming input
    * (st12), so the two cannot drift.
    */
  private[graft] def qualityScoredDf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val en = inList(stopwords.head._2)
    docs
      .withColumn("n_tokens", expr("size(split(text, ' '))"))
      .withColumn("stop_ratio", expr(
        s"size(filter(split(text, ' '), w -> w IN $en)) / CAST(n_tokens AS DOUBLE)"))
      .withColumn("uniq_ratio", expr(
        "size(array_distinct(split(text, ' '))) / CAST(n_tokens AS DOUBLE)"))
      .withColumn("mean_token_len", expr(
        "length(replace(text, ' ', '')) / CAST(n_tokens AS DOUBLE)"))
      .withColumn("quality_score", Money.moneyRound(
        lit(100d) * (lit(0.4d) * col("stop_ratio") +
          lit(0.3d) * col("uniq_ratio") +
          lit(0.3d) * least(col("n_tokens") / 100d, lit(1d)))))
  }

  /** DuckDB `t`/`q` CTEs in lockstep with [[qualityScored]] (shared by
    * the x02 and x42 oracles).
    */
  private[graft] def duckQualityCtes: String = {
    val en = inList(stopwords.head._2)
    s"""t AS (
  SELECT doc_id, lang, source, text,
    len(string_split(text, ' ')) AS n_tokens,
    len(list_filter(string_split(text, ' '), w -> w IN $en))
      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
    len(list_distinct(string_split(text, ' ')))
      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS uniq_ratio,
    length(replace(text, ' ', ''))
      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_token_len
  FROM documents
),
q AS (
  SELECT *, ${sqlRound(
      "100 * (0.4*stop_ratio + 0.3*uniq_ratio + 0.3*least(n_tokens/100.0, 1.0))")}
    AS quality_score
  FROM t
)"""
  }

  /** The x01 tokenizer spellings (whitespace + BPE-ish regex), factored
    * ONCE per engine: x01, x79, and st15 all count with these exact
    * expressions — bit-identical integer counts are precisely st15's
    * "drained state == batch rollup" claim and x79's "audits the
    * tokenizations x01 reports" claim, so a drifted copy would silently
    * decouple the twins.
    */
  private[graft] val sparkWsTokens =
    "CAST(size(split(text, ' ')) AS BIGINT)"
  private[graft] val sparkReTokens =
    "CAST(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS BIGINT)"
  private[graft] val duckWsTokens =
    "CAST(len(string_split(text, ' ')) AS BIGINT)"
  private[graft] val duckReTokens =
    "CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)"

  /** x16's deterministic md5-bucket split, factored per engine so the
    * x43 leakage audit tags documents with EXACTLY the split the holdout
    * query assigns (a drifted copy would audit a different split).
    * Bucket = first 15 md5 nibbles of the doc id mod 10; 0 ⇒ validation.
    */
  private[operators] val sparkSplitCase: String =
    """CASE WHEN pmod(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15),
       16, 10) AS BIGINT), 10) = 0 THEN 'validation' ELSE 'train' END"""
  /** Normalized-text exact-dedup fingerprint — lowercase, trimmed,
    * runs of spaces collapsed, md5'd. ONE spelling shared by x04,
    * corpus_prepare, and corpus_curate (a drifted copy would dedup the
    * flagship on a different key than the standalone queries).
    */
  private[graft] def fpNormCol: org.apache.spark.sql.Column =
    md5(regexp_replace(lower(trim(col("text"))), " +", " ")
      .cast("binary"))

  /** DuckDB twin of [[fpNormCol]]. */
  private[graft] val duckFpNorm: String =
    "md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))"

  private[operators] val duckSplitCase: String =
    """CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         AS BIGINT) % 10 = 0
       THEN 'validation' ELSE 'train' END"""

  def defs: Map[String, QueryDef] = Map(

    // ── Token counting: whitespace tokens, BPE-ish regex tokens, alpha mass
    "x01_text_tokens" -> QueryDef(
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).cast("bigint").as("n_chars_actual"),
        expr(sparkWsTokens).as("n_tokens_ws"),
        expr(sparkReTokens).as("n_tokens_re"),
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("bigint")
          .as("n_alpha"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              CAST(length(text) AS BIGINT) AS n_chars_actual,
              $duckWsTokens AS n_tokens_ws,
              $duckReTokens AS n_tokens_re,
              CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
                AS n_alpha
              FROM documents ORDER BY doc_id""")),

    // ── Quality scoring: stopword/unique-token ratios, mean token length,
    // blended 0-100 score + keep-flag (the C4/Gopher-style filter shape)
    "x02_text_quality" -> QueryDef(
      (s, d) => qualityScored(s, d)
        .select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"),
          col("stop_ratio"), col("uniq_ratio"), col("mean_token_len"),
          col("quality_score"),
          (col("quality_score") >= 25d).as("keep"))
        .orderBy("doc_id"),
      Some(s"""
WITH $duckQualityCtes
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, stop_ratio,
  uniq_ratio, mean_token_len, quality_score,
  quality_score >= 25 AS keep
FROM q ORDER BY doc_id""")),

    // ── Language ID: stopword-hit argmax with fixed tie-break order
    "x03_lang_id" -> QueryDef(
      (s, d) => {
        val hits = stopwords.map { case (l, ws) =>
          l -> s"size(filter(split(text, ' '), w -> w IN ${inList(ws)}))"
        }
        val Seq(en, es, de, fr) = hits.map(_._2)
        Tables.documents(s, d)
          .withColumn("h_en", expr(en)).withColumn("h_es", expr(es))
          .withColumn("h_de", expr(de)).withColumn("h_fr", expr(fr))
          .withColumn("pred_lang",
            when(col("h_en") === 0 && col("h_es") === 0 &&
              col("h_de") === 0 && col("h_fr") === 0, "unknown")
              .when(col("h_en") >= col("h_es") && col("h_en") >= col("h_de")
                && col("h_en") >= col("h_fr"), "en")
              .when(col("h_es") >= col("h_de") && col("h_es") >= col("h_fr"),
                "es")
              .when(col("h_de") >= col("h_fr"), "de")
              .otherwise("fr"))
          .select(col("doc_id"), col("lang"), col("pred_lang"),
            (col("lang") === col("pred_lang")).as("is_match"),
            col("h_en").cast("bigint").as("h_en"),
            col("h_es").cast("bigint").as("h_es"),
            col("h_de").cast("bigint").as("h_de"),
            col("h_fr").cast("bigint").as("h_fr"))
          .orderBy("doc_id")
      },
      Some {
        val hits = stopwords.map { case (l, ws) =>
          s"len(list_filter(string_split(text, ' '), w -> w IN ${inList(ws)})) AS h_$l"
        }.mkString(",\n    ")
        s"""
WITH t AS (SELECT doc_id, lang, text, $hits FROM documents)
SELECT doc_id, lang,
  CASE WHEN h_en = 0 AND h_es = 0 AND h_de = 0 AND h_fr = 0 THEN 'unknown'
       WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr THEN 'en'
       WHEN h_es >= h_de AND h_es >= h_fr THEN 'es'
       WHEN h_de >= h_fr THEN 'de' ELSE 'fr' END AS pred_lang,
  lang = (CASE WHEN h_en = 0 AND h_es = 0 AND h_de = 0 AND h_fr = 0
            THEN 'unknown'
          WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr THEN 'en'
          WHEN h_es >= h_de AND h_es >= h_fr THEN 'es'
          WHEN h_de >= h_fr THEN 'de' ELSE 'fr' END) AS is_match,
  CAST(h_en AS BIGINT) AS h_en, CAST(h_es AS BIGINT) AS h_es,
  CAST(h_de AS BIGINT) AS h_de, CAST(h_fr AS BIGINT) AS h_fr
FROM t ORDER BY doc_id"""
      }),

    // ── Label-noise estimation: the x03 detector's confusion matrix
    // against the declared language labels — (declared, predicted)
    // counts plus each cell's share of its declared-language row. The
    // QC readout that tells a corpus owner whether the metadata or the
    // detector is lying. One aggregation over the map-side detection;
    // the share is a single IEEE division of exact counts (the window
    // total rides the same tiny grouped frame).
    "x35_lang_confusion" -> QueryDef(
      (s, d) => {
        val hits = stopwords.map { case (l, ws) =>
          l -> s"size(filter(split(text, ' '), w -> w IN ${inList(ws)}))"
        }
        val Seq(en, es, de, fr) = hits.map(_._2)
        val byLang = org.apache.spark.sql.expressions.Window
          .partitionBy("lang")
        Tables.documents(s, d)
          .withColumn("h_en", expr(en)).withColumn("h_es", expr(es))
          .withColumn("h_de", expr(de)).withColumn("h_fr", expr(fr))
          .withColumn("pred_lang",
            when(col("h_en") === 0 && col("h_es") === 0 &&
              col("h_de") === 0 && col("h_fr") === 0, "unknown")
              .when(col("h_en") >= col("h_es") && col("h_en") >= col("h_de")
                && col("h_en") >= col("h_fr"), "en")
              .when(col("h_es") >= col("h_de") && col("h_es") >= col("h_fr"),
                "es")
              .when(col("h_de") >= col("h_fr"), "de")
              .otherwise("fr"))
          .groupBy(col("lang"), col("pred_lang"))
          .agg(count(lit(1)).as("n"))
          .withColumn("row_share",
            col("n").cast("double") /
              sum(col("n")).over(byLang).cast("double"))
          .orderBy("lang", "pred_lang")
      },
      Some {
        val hits = stopwords.map { case (l, ws) =>
          s"len(list_filter(string_split(text, ' '), w -> w IN ${inList(ws)})) AS h_$l"
        }.mkString(",\n    ")
        s"""
WITH t AS (SELECT doc_id, lang, text, $hits FROM documents),
p AS (
  SELECT lang,
    CASE WHEN h_en = 0 AND h_es = 0 AND h_de = 0 AND h_fr = 0
      THEN 'unknown'
    WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr THEN 'en'
    WHEN h_es >= h_de AND h_es >= h_fr THEN 'es'
    WHEN h_de >= h_fr THEN 'de' ELSE 'fr' END AS pred_lang
  FROM t
),
c AS (
  SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2
)
SELECT lang, pred_lang, n,
  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE)
    AS row_share
FROM c ORDER BY lang, pred_lang"""
      }),

    // ── Document fingerprinting: full/normalized/prefix md5 fingerprints
    "x04_fingerprint" -> QueryDef(
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("fp_full"),
        fpNormCol.as("fp_norm"),
        md5(substring(col("text"), 1, 64).cast("binary")).as("fp_prefix"),
        expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)")
          .as("fp_long"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              md5(text) AS fp_full,
              $duckFpNorm
                AS fp_norm,
              md5(substr(text, 1, 64)) AS fp_prefix,
              CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS fp_long
              FROM documents ORDER BY doc_id""")),

    // ── Corpus length-distribution QC: decile bounds of document length
    // per language — ntile over a TOTAL order (n_chars, then doc_id) is
    // deterministic on both engines; the decile summary is the shape a
    // pipeline dashboards before/after each filtering stage. One window
    // shuffle on lang + one tiny aggregation.
    "x15_length_deciles" -> QueryDef(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
        Tables.documents(s, d)
          .withColumn("decile", ntile(10).over(w).cast("bigint"))
          .groupBy(col("lang"), col("decile"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("len_lo"),
            max(col("n_chars")).as("len_hi"))
          .orderBy("lang", "decile")
      },
      Some("""
SELECT lang, decile, count(*) AS n_docs,
  min(n_chars) AS len_lo, max(n_chars) AS len_hi
FROM (SELECT lang, n_chars,
        ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
          AS decile
      FROM documents)
GROUP BY 1, 2 ORDER BY lang, decile"""),
      "per-language length deciles: total-order ntile, deterministic"),

    // ── Deterministic held-out split: assign every document to
    // train/validation by md5 hash bucket — the corpus-standard split
    // (stable under re-runs, insertion order, and partitioning; no RNG,
    // no shuffle at all — pure map). Bucket = first 15 md5 nibbles of
    // the doc id mod 10; bucket 0 ⇒ validation (~10%).
    "x16_split_holdout" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          expr(sparkSplitCase).as("split"))
        .orderBy("doc_id"),
      Some(s"""
SELECT doc_id, lang, $duckSplitCase AS split
FROM documents ORDER BY doc_id"""),
      "md5-bucket train/validation split: deterministic, map-only"),

    // ── The corpus-prep pipeline COMPOSED end-to-end (the LLM-side
    // flagship, as loan_detail is for the relational side): quality
    // score → threshold filter → exact dedup keep-first on the
    // normalized fingerprint → deterministic held-out split. Shapes:
    // scoring and splitting are pure map stages, the dedup is the one
    // hash shuffle (window on fp_norm), and the quality filter runs
    // BEFORE the shuffle so losers never ship.
    "corpus_prepare" -> QueryDef(
      (s, d) => {
        val en = inList(stopwords.head._2)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("fp_norm").orderBy("doc_id")
        Tables.documents(s, d)
          .withColumn("n_tokens", expr("size(split(text, ' '))"))
          .withColumn("stop_ratio", expr(
            s"size(filter(split(text, ' '), w -> w IN $en)) / CAST(n_tokens AS DOUBLE)"))
          .withColumn("uniq_ratio", expr(
            "size(array_distinct(split(text, ' '))) / CAST(n_tokens AS DOUBLE)"))
          .withColumn("quality_score", Money.moneyRound(
            lit(100d) * (lit(0.4d) * col("stop_ratio") +
              lit(0.3d) * col("uniq_ratio") +
              lit(0.3d) * least(col("n_tokens") / 100d, lit(1d)))))
          .filter(col("quality_score") >= 25d)
          .withColumn("fp_norm", fpNormCol)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .withColumn("split",
            when(expr("pmod(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT), 10)") === 0,
              "validation").otherwise("train"))
          .select(col("doc_id"), col("lang"),
            col("n_tokens").cast("bigint").as("n_tokens"),
            col("quality_score"), col("split"))
          .orderBy("doc_id")
      },
      Some {
        val en = inList(stopwords.head._2)
        s"""
WITH scored AS (
  SELECT doc_id, lang, text,
    len(string_split(text, ' ')) AS n_tokens,
    ${sqlRound(
          s"""100 * (0.4 * (len(list_filter(string_split(text, ' '), w -> w IN $en))
                / CAST(len(string_split(text, ' ')) AS DOUBLE))
              + 0.3 * (len(list_distinct(string_split(text, ' ')))
                / CAST(len(string_split(text, ' ')) AS DOUBLE))
              + 0.3 * least(len(string_split(text, ' ')) / 100.0, 1.0))""")}
      AS quality_score
  FROM documents
),
kept AS (
  SELECT *, ${duckFpNorm}
    AS fp_norm
  FROM scored WHERE quality_score >= 25
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY fp_norm ORDER BY doc_id)
      AS rn
    FROM kept)
  WHERE rn = 1
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, quality_score,
  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         AS BIGINT) % 10 = 0
       THEN 'validation' ELSE 'train' END AS split
FROM deduped ORDER BY doc_id"""
      },
      "corpus flagship: quality filter → exact dedup → held-out split"),

    // ── Repetition signals (the Gopher-style repetition filters): per-doc
    // top word-2-gram share and duplicate 2-/3-gram fractions. The scalable
    // spelling is explode → count per (doc, g, gram) → per-doc rollup: both
    // aggregations are keyed by doc_id-prefixed keys so they partial-agg
    // map-side and the post-shuffle row count is bounded by distinct grams
    // per doc, never corpus-wide state. A per-doc HOF argmax
    // (array_max over transform(array_distinct...)) would be O(n·distinct)
    // per row — quadratic in doc length — which is why the explode shape
    // wins for long documents.
    "x57_repetition_stats" -> QueryDef(
      (s, d) => {
        val toks = Tables.documentsSpread(s, d).select(col("doc_id"),
          expr("split(text, ' ')").as("tk"),
          expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tokens"))
        val wide = repPerDoc(toks)
        toks.select("doc_id", "n_tokens")
          .join(wide, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            col("top2").cast("bigint").as("top2_cnt"),
            col("tot2").cast("bigint").as("n_2grams"),
            col("dst2").cast("bigint").as("dst_2grams"),
            expr(top2FracExpr).as("top_2gram_frac"),
            expr(dup2FracExpr).as("dup_2gram_frac"),
            expr("CAST(top3 AS DOUBLE) / tot3").as("top_3gram_frac"),
            expr("CAST(tot3 - dst3 AS DOUBLE) / tot3").as("dup_3gram_frac"),
            expr(repetitiveExpr).as("repetitive"))
          .orderBy("doc_id")
      },
      Some(s"""
WITH $duckRepCtes
SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens,
  CAST(top2 AS BIGINT) AS top2_cnt,
  CAST(tot2 AS BIGINT) AS n_2grams,
  CAST(dst2 AS BIGINT) AS dst_2grams,
  $top2FracExpr AS top_2gram_frac,
  $dup2FracExpr AS dup_2gram_frac,
  CAST(top3 AS DOUBLE) / tot3 AS top_3gram_frac,
  CAST(tot3 - dst3 AS DOUBLE) / tot3 AS dup_3gram_frac,
  $repetitiveExpr AS repetitive
FROM rtoks t LEFT JOIN rwide USING (doc_id) ORDER BY doc_id"""),
      "Gopher-style per-doc repetition signals via explode + two keyed aggs"),

    // ── Filter-funnel survival: docs and tokens surviving the cumulative
    // curation chain (length → language-identifiable → quality →
    // non-repetitive) — the observability readout a corpus owner checks
    // before committing a filter recipe. Per-doc flags are one map pass
    // (plus the x57 repetition rollup, re-spelled from the SAME factored
    // exprs so the funnel audits exactly the filters the other queries
    // apply); the funnel itself is a single global aggregation to one row,
    // unpivoted with stack(). Survival shares are single IEEE divisions
    // of exact counts.
    "x58_filter_funnel" -> QueryDef(
      (s, d) => {
        val flags = curationFlags(s, d)
        flags.agg(
          count(lit(1)).as("d0"),
          sum(when(col("f1"), 1L).otherwise(0L)).as("d1"),
          sum(when(col("f1") && col("f2"), 1L).otherwise(0L)).as("d2"),
          sum(when(col("f1") && col("f2") && col("f3"), 1L).otherwise(0L))
            .as("d3"),
          sum(when(col("f1") && col("f2") && col("f3") && col("f4"), 1L)
            .otherwise(0L)).as("d4"),
          sum(col("n_tokens")).as("t0"),
          sum(when(col("f1"), col("n_tokens")).otherwise(0L)).as("t1"),
          sum(when(col("f1") && col("f2"), col("n_tokens")).otherwise(0L))
            .as("t2"),
          sum(when(col("f1") && col("f2") && col("f3"), col("n_tokens"))
            .otherwise(0L)).as("t3"),
          sum(when(col("f1") && col("f2") && col("f3") && col("f4"),
            col("n_tokens")).otherwise(0L)).as("t4"))
          .select(expr(
            """stack(5,
               '0_all',        d0, CAST(t0 AS BIGINT), CAST(d0 AS DOUBLE) / d0,
               '1_length',     d1, CAST(t1 AS BIGINT), CAST(d1 AS DOUBLE) / d0,
               '2_lang',       d2, CAST(t2 AS BIGINT), CAST(d2 AS DOUBLE) / d0,
               '3_quality',    d3, CAST(t3 AS BIGINT), CAST(d3 AS DOUBLE) / d0,
               '4_repetition', d4, CAST(t4 AS BIGINT), CAST(d4 AS DOUBLE) / d0)
               AS (stage, docs, tokens, doc_share)"""))
          .orderBy("stage")
      },
      Some {
        s"""
WITH $duckQualityCtes,
$duckRepCtes,
$duckFlagsCte,
agg AS (
  SELECT count(*) AS d0,
    sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS d1,
    sum(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS d2,
    sum(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS d3,
    sum(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END) AS d4,
    sum(n_tokens) AS t0,
    sum(CASE WHEN f1 THEN n_tokens ELSE 0 END) AS t1,
    sum(CASE WHEN f1 AND f2 THEN n_tokens ELSE 0 END) AS t2,
    sum(CASE WHEN f1 AND f2 AND f3 THEN n_tokens ELSE 0 END) AS t3,
    sum(CASE WHEN f1 AND f2 AND f3 AND f4 THEN n_tokens ELSE 0 END) AS t4
  FROM flags
)
SELECT '0_all' AS stage, CAST(d0 AS BIGINT) AS docs,
  CAST(t0 AS BIGINT) AS tokens, CAST(d0 AS DOUBLE) / d0 AS doc_share
FROM agg
UNION ALL SELECT '1_length', CAST(d1 AS BIGINT), CAST(t1 AS BIGINT),
  CAST(d1 AS DOUBLE) / d0 FROM agg
UNION ALL SELECT '2_lang', CAST(d2 AS BIGINT), CAST(t2 AS BIGINT),
  CAST(d2 AS DOUBLE) / d0 FROM agg
UNION ALL SELECT '3_quality', CAST(d3 AS BIGINT), CAST(t3 AS BIGINT),
  CAST(d3 AS DOUBLE) / d0 FROM agg
UNION ALL SELECT '4_repetition', CAST(d4 AS BIGINT), CAST(t4 AS BIGINT),
  CAST(d4 AS DOUBLE) / d0 FROM agg
ORDER BY stage"""
      },
      "cumulative curation-funnel survival (docs + tokens per filter stage)"),

    // ── The composed curation flagship: the whole training-data prep
    // chain as ONE declarative plan — funnel filters (exactly x58's
    // flags) → exact normalized-fingerprint dedup keep-first (the
    // corpus_prepare spelling) → per-source token-weighted priority
    // sample (exactly x60's ranking, k = PipelineQueries.SampleK) → per-language sequence
    // packing (the x17 prefix-sum bins). Every stage reuses the factored
    // expression its standalone query declares, so this IS the
    // composition a reference user would run, not a re-implementation.
    // Catalyst sees one tree: the filters and the gram rollup fuse
    // map-side, the three window stages each key a bounded partition
    // (fingerprint / source / language), and nothing collects.
    "corpus_curate" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val kept = curationFlags(s, d)
          .filter(col("f1") && col("f2") && col("f3") && col("f4"))
          .withColumn("fp_norm", fpNormCol)
        val dd = kept
          .withColumn("rn", row_number().over(
            Window.partitionBy("fp_norm").orderBy("doc_id")))
          .filter(col("rn") === 1)
        val sampled = dd
          .withColumn("priority", expr(PipelineQueries.prioritySparkExpr))
          .withColumn("rk", row_number().over(
            Window.partitionBy("source")
              .orderBy(col("priority").desc, col("doc_id"))))
          .filter(col("rk") <= PipelineQueries.SampleK)
        val packW = Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        sampled
          .withColumn("offset",
            coalesce(sum(col("n_tokens")).over(packW), lit(0L)))
          .withColumn("bin_id",
            expr(s"offset div ${PipelineQueries.PackTarget}"))
          .groupBy(col("lang"), col("bin_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("bigint").as("total_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy("lang", "bin_id")
      },
      Some(s"""
WITH $duckQualityCtes,
$duckRepCtes,
$duckFlagsCte,
kept AS (
  SELECT *, ${duckFpNorm}
    AS fp_norm
  FROM flags WHERE f1 AND f2 AND f3 AND f4
),
dd AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY fp_norm ORDER BY doc_id)
      AS rn
    FROM kept)
  WHERE rn = 1
),
sampled AS (
  SELECT * FROM (
    SELECT *, row_number()
      OVER (PARTITION BY source ORDER BY priority DESC, doc_id) AS rk
    FROM (SELECT *, ${PipelineQueries.priorityDuckExpr} AS priority
          FROM dd))
  WHERE rk <= ${PipelineQueries.SampleK}
),
packed AS (
  SELECT lang, doc_id, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      // ${PipelineQueries.PackTarget} AS BIGINT) AS bin_id
  FROM sampled
)
SELECT lang, bin_id, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM packed GROUP BY 1, 2 ORDER BY lang, bin_id"""),
      "curation flagship: funnel filters → exact dedup → priority sample → sequence packing"),

    // ── Corpus-level n-gram diversity per source: distinct-to-total
    // ratio for word 1/2/3-grams ACROSS a source's documents — the
    // self-repetition audit that flags template-generated or
    // model-generated sources (low distinct-n), complementing x57's
    // WITHIN-document repetition flags. Same fan-out idiom as
    // [[repPerDoc]] but keyed by source: explode → (source, g, gram)
    // count with map-side combine → a |sources|·3-row rollup; the
    // diversity ratio is ONE division of exact integers.
    "x67_ngram_diversity" -> QueryDef(
      (s, d) => {
        val toks = Tables.documentsSpread(s, d)
          .select(col("source"), expr("split(text, ' ')").as("tk"),
            expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tokens"))
        def grams(k: Int) = {
          val parts = (k - 1 to 0 by -1)
            .map(j => s"element_at(tk, i - $j)").mkString(", ")
          toks.where(col("n_tokens") >= k).select(col("source"),
            lit(k.toLong).as("g"),
            explode(expr(s"transform(sequence($k, CAST(size(tk) AS INT))," +
              s" i -> concat_ws(' ', $parts))")).as("gram"))
        }
        grams(1).unionByName(grams(2)).unionByName(grams(3))
          .groupBy("source", "g", "gram").agg(count(lit(1)).as("c"))
          .groupBy("source", "g")
          .agg(sum("c").as("total_grams"),
            count(lit(1)).as("distinct_grams"),
            max("c").as("top_gram_count"))
          .withColumn("diversity", col("distinct_grams").cast("double") /
            col("total_grams").cast("double"))
          .orderBy("source", "g")
      },
      Some("""
WITH t AS (
  SELECT source, string_split(text, ' ') AS tk,
    len(string_split(text, ' ')) AS n FROM documents
),
grams AS (
  SELECT source, CAST(1 AS BIGINT) AS g, tk[i] AS gram
  FROM t, UNNEST(generate_series(1, n)) AS u(i) WHERE n >= 1
  UNION ALL
  SELECT source, CAST(2 AS BIGINT), tk[i-1] || ' ' || tk[i]
  FROM t, UNNEST(generate_series(2, n)) AS u(i) WHERE n >= 2
  UNION ALL
  SELECT source, CAST(3 AS BIGINT), tk[i-2] || ' ' || tk[i-1] || ' ' || tk[i]
  FROM t, UNNEST(generate_series(3, n)) AS u(i) WHERE n >= 3
),
c AS (SELECT source, g, gram, count(*) AS c FROM grams GROUP BY 1, 2, 3)
SELECT source, g, CAST(sum(c) AS BIGINT) AS total_grams,
  CAST(count(*) AS BIGINT) AS distinct_grams,
  CAST(max(c) AS BIGINT) AS top_gram_count,
  CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS diversity
FROM c GROUP BY 1, 2 ORDER BY 1, 2"""),
      "per-source 1/2/3-gram diversity (template/model-generated source audit)"),

    // ── Quality-score calibration AUC per source: how well does the x02
    // heuristic score separate English from non-English documents in
    // each corpus slice? (The blend leans on English stopwords, so
    // AUC-vs-is-English is the natural calibration probe; swap the
    // label column to calibrate against any weak signal.) AUC is the
    // Mann-Whitney rank statistic, computed EXACTLY in integers: scores
    // are 2-decimal by construction (moneyRound), so cents are exact
    // BIGINTs; grouping by (source, cents) bounds every downstream
    // stage at ≤ 10 001 distinct scores per source regardless of corpus
    // size; tie handling is mid-rank, and 2·midrank = 2·cum_before +
    // cnt + 1 stays integral. auc_num2 = 2·Σ_pos midrank − n_pos·
    // (n_pos+1) = 2·U, so auc = auc_num2 / (2·n_pos·n_neg) is ONE IEEE
    // division of exact integers — bit-identical cross-engine. Shuffle
    // inventory: one (source, cents) partial-agg, one source-keyed
    // window over the tiny distinct-score table, one source rollup.
    "x77_quality_auc" -> QueryDef(
      (s, d) => aucBySlice(
        qualityScored(s, d)
          .withColumn("cents",
            expr("CAST(floor(quality_score * 100 + 0.5d) AS BIGINT)"))
          .withColumn("pos", (col("lang") === "en").cast("bigint")),
        slice = "source", score = "cents", pos = "pos"),
      Some(s"""
WITH $duckQualityCtes,
sc AS (
  SELECT source, CAST(floor(quality_score * 100 + 0.5) AS BIGINT) AS cents,
    CAST(count(*) AS BIGINT) AS cnt,
    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos_cnt
  FROM q GROUP BY 1, 2
),
cum AS (
  SELECT source, cents, cnt, pos_cnt,
    CAST(coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY cents
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cum_before
  FROM sc
),
agg AS (
  SELECT source,
    CAST(sum(pos_cnt) AS BIGINT) AS n_pos,
    CAST(sum(cnt) - sum(pos_cnt) AS BIGINT) AS n_neg,
    sum(CAST(pos_cnt AS HUGEINT) * (2 * cum_before + cnt + 1)) AS u2
  FROM cum GROUP BY 1
)
SELECT source, n_pos, n_neg,
  CAST(u2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT)
    AS auc_num2,
  CASE WHEN n_pos > 0 AND n_neg > 0
    THEN CAST(u2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
      / (2.0 * n_pos * n_neg)
  END AS auc
FROM agg ORDER BY source"""),
      "per-source Mann-Whitney AUC of the quality score vs is-English, exact integers"),

    // ── Tokenizer fertility per (lang, source): subword-ish regex tokens
    // per whitespace word — THE number a multilingual-tokenizer owner
    // checks before committing a vocab (a language whose fertility runs
    // 2× the corpus mean pays 2× the compute per sentence and starves in
    // a token-budgeted mixture). Reuses x01's two tokenizer spellings
    // verbatim so the ratio audits exactly the tokenizations the
    // standalone query reports. One partial-aggregated rollup over
    // per-doc exact integer counts; fertility is ONE IEEE division of
    // the summed integers. Corpus-mean comparison rides in as the same
    // two integers summed globally (a 1-row broadcast), so the
    // `vs_corpus` ratio is division of exact integers too.
    "x79_tokenizer_fertility" -> QueryDef(
      (s, d) => {
        val t = Tables.documents(s, d).select(
          col("lang"), col("source"),
          expr(sparkWsTokens).as("ws"),
          expr(sparkReTokens).as("re"))
        val tot = t.agg(sum(col("ws")).as("tws"), sum(col("re")).as("tre"))
        t.groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ws")).as("ws_tokens"),
            sum(col("re")).as("re_tokens"))
          .crossJoin(broadcast(tot))
          .select(col("lang"), col("source"), col("n_docs"),
            col("ws_tokens"), col("re_tokens"),
            (col("re_tokens").cast("double") /
              col("ws_tokens").cast("double")).as("fertility"),
            // ratio of the two exact divisions, NOT of integer products:
            // products overflow BIGINT near 1e19 token-pairs (DuckDB
            // would widen to HUGEINT, Spark would wrap — a divergence);
            // chained IEEE division of identical doubles is correctly
            // rounded per-op, so both engines agree at any scale
            ((col("re_tokens").cast("double") /
              col("ws_tokens").cast("double")) /
              (col("tre").cast("double") / col("tws").cast("double")))
              .as("vs_corpus"))
          .orderBy("lang", "source")
      },
      Some(s"""
WITH t AS (
  SELECT lang, source,
    $duckWsTokens AS ws,
    $duckReTokens AS re
  FROM documents
),
tot AS (SELECT CAST(sum(ws) AS BIGINT) AS tws,
               CAST(sum(re) AS BIGINT) AS tre FROM t)
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(ws) AS BIGINT) AS ws_tokens,
  CAST(sum(re) AS BIGINT) AS re_tokens,
  CAST(sum(re) AS DOUBLE) / CAST(sum(ws) AS DOUBLE) AS fertility,
  (CAST(sum(re) AS DOUBLE) / CAST(sum(ws) AS DOUBLE))
    / (CAST(tot.tre AS DOUBLE) / CAST(tot.tws AS DOUBLE)) AS vs_corpus
FROM t CROSS JOIN tot
GROUP BY lang, source, tot.tws, tot.tre
ORDER BY lang, source"""),
      "subword-per-word fertility per (lang, source) vs the corpus mean"))

  /** The exact Mann-Whitney AUC core behind x77: `score` an integer
    * column, `pos` a 0/1 BIGINT label, `slice` the grouping key. Ties
    * use mid-ranks (2·midrank = 2·cum_before + cnt + 1 stays integral);
    * `auc_num2` = 2·U, `auc` = auc_num2 / (2·n_pos·n_neg) — NULL when a
    * slice is single-class. Factored so AucSpec can pin it against the
    * O(n²) pair-counting definition on constructed inputs.
    *
    * The rank accumulation runs in DECIMAL(38,0) (Spark) / HUGEINT
    * (DuckDB): u2_part ≈ 2·n_pos·n per score group would overflow a
    * BIGINT accumulator past ~2·10⁹ docs per slice — Spark would wrap
    * (or ANSI-throw) while DuckDB widens, a cross-engine divergence at
    * exactly the scale the engine targets; 128-bit headroom is exact to
    * ~10¹⁸ docs per slice. The REPORTED `auc_num2` is cast back to
    * BIGINT (the registry's output convention — no declared query emits
    * decimals), which bounds the reportable statistic at
    * 2·n_pos·n_neg ≤ 9.2·10¹⁸ (~2·10⁹ docs per class per slice); past
    * that the two engines overflow the same exact 128-bit value
    * identically at the cast, not differently mid-sum. The final `auc`
    * stays ONE IEEE division with the shared association order
    * `(2.0 · n_pos) · n_neg`.
    */
  private[graft] def aucBySlice(df: org.apache.spark.sql.DataFrame,
      slice: String, score: String, pos: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sc = df.groupBy(col(slice), col(score).as("__sc"))
      .agg(count(lit(1)).as("cnt"), sum(col(pos)).as("pos_cnt"))
    val w = Window.partitionBy(slice).orderBy("__sc")
      .rowsBetween(Window.unboundedPreceding, -1)
    sc.withColumn("cum_before",
        coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("u2_part",
        col("pos_cnt").cast("decimal(38,0)") *
          (lit(2) * col("cum_before") + col("cnt") + 1))
      .groupBy(slice)
      .agg(sum(col("pos_cnt")).as("n_pos"),
        (sum(col("cnt")) - sum(col("pos_cnt"))).as("n_neg"),
        sum(col("u2_part")).as("u2"))
      .select(col(slice), col("n_pos"), col("n_neg"),
        (col("u2") - col("n_pos").cast("decimal(38,0)") *
          (col("n_pos") + 1)).cast("bigint").as("auc_num2"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("u2") - col("n_pos").cast("decimal(38,0)") *
            (col("n_pos") + 1)).cast("double")
            / (lit(2d) * col("n_pos") * col("n_neg")))
          .as("auc"))
      .orderBy(slice)
  }

  /** Per-doc curation flags over the documents table — the single
    * source of truth for the funnel (x58) AND the composed
    * `corpus_curate` flagship: f1 length ∈ [20, 1000] tokens, f2
    * language-identifiable (any stopword hit), f3 quality_score ≥ 25
    * (the x02 spelling), f4 non-repetitive (the x57 flag). One map
    * pass plus the x57 gram rollup joined on doc_id.
    */
  private[graft] def curationFlags(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    // spread: the gram fan-out below is the most token-dense expression
    // in the registry — serial on a one-split corpus otherwise
    val toks = Tables.documentsSpread(s, d).select(col("doc_id"),
      expr("split(text, ' ')").as("tk"),
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tokens"))
    withBaseFlags(qualityScored(s, d))
      .select("doc_id", "lang", "source", "text", "n_tokens",
        "f1", "f2", "f3")
      .join(repPerDoc(toks), Seq("doc_id"), "left")
      .withColumn("f4", expr(s"NOT coalesce($repetitiveExpr, FALSE)"))
      .select("doc_id", "lang", "source", "text", "n_tokens",
        "f1", "f2", "f3", "f4")
  }

  /** f1 (length), f2 (language-identifiable), f3 (quality) over a
    * [[qualityScoredDf]] output — the row-local flag triple shared by
    * curationFlags (batch) and rowLocalFlags (streaming).
    */
  private def withBaseFlags(scored: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val hitSum = stopwords.map { case (_, ws) =>
      s"size(filter(split(text, ' '), w -> w IN ${inList(ws)}))"
    }.mkString(" + ")
    scored
      .withColumn("f1", col("n_tokens").between(20, 1000))
      .withColumn("f2", expr(s"($hitSum) > 0"))
      .withColumn("f3", col("quality_score") >= 25d)
  }

  /** Row-local spelling of [[curationFlags]] for STREAMING input: the
    * f1/f2/f3 exprs are identical, but f4's gram stats come from
    * per-row HOFs over the token array instead of the explode + rollup
    * (structured streaming forbids chained aggregations, and an ingest
    * gate sees each doc exactly once, so the O(n·distinct) per-row cost
    * is bounded by the doc length the gate itself caps). Same integer
    * counts, same single divisions, same flag — `RepetitionSpec` pins
    * the two spellings equal on every doc.
    */
  private[graft] def rowLocalFlags(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    withBaseFlags(qualityScoredDf(docs))
      .withColumn("tk", expr("split(text, ' ')"))
      .withColumn("bg", expr(
        """CASE WHEN size(tk) >= 2
           THEN transform(sequence(2, size(tk)),
                  i -> concat_ws(' ', element_at(tk, i - 1),
                                 element_at(tk, i)))
           END""".replace('\n', ' ')))
      .withColumn("top2", expr(
        "array_max(transform(array_distinct(bg), g -> size(filter(bg, x -> x = g))))"))
      .withColumn("tot2", expr("size(bg)"))
      .withColumn("dst2", expr("size(array_distinct(bg))"))
      .withColumn("f4", expr(s"NOT coalesce($repetitiveExpr, FALSE)"))
  }

  /** DuckDB twin of [[curationFlags]] (CTE `flags`; requires
    * [[duckQualityCtes]] and [[duckRepCtes]] earlier in the WITH chain).
    */
  private[graft] def duckFlagsCte: String = {
    val hitSum = stopwords.map { case (_, ws) =>
      s"len(list_filter(string_split(text, ' '), w -> w IN ${inList(ws)}))"
    }.mkString(" + ")
    s"""flags AS (
  SELECT q.doc_id, q.lang, q.source, q.text, q.n_tokens,
    q.n_tokens BETWEEN 20 AND 1000 AS f1,
    ($hitSum) > 0 AS f2,
    q.quality_score >= 25 AS f3,
    NOT coalesce($repetitiveExpr, FALSE) AS f4
  FROM q LEFT JOIN rwide ON q.doc_id = rwide.doc_id
)"""
  }

  /** Shared spellings for the x57/x58 repetition fractions — factored so
    * the funnel's stage-4 filter is EXACTLY the x57 flag (a drifted copy
    * would audit a different filter). Each is a single IEEE division of
    * exact integers (bit-identical cross-engine).
    */
  private val top2FracExpr = "CAST(top2 AS DOUBLE) / tot2"
  private val dup2FracExpr = "CAST(tot2 - dst2 AS DOUBLE) / tot2"
  private val repetitiveExpr =
    s"($top2FracExpr > 0.08 OR $dup2FracExpr > 0.08)"

  /** Per-doc word-2/3-gram rollup: for each doc the most frequent gram's
    * count (`topN`), the gram total (`totN`) and the distinct-gram count
    * (`dstN`). Input must carry `doc_id`, `tk` (token array), `n_tokens`.
    * Both grouping keys start with doc_id, so the whole chain partial-aggs
    * map-side and shuffles at most one row per distinct (doc, gram).
    */
  private[graft] def repPerDoc(toks: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // BOTH gram sizes fan out of ONE corpus scan (a union of two
    // per-k branches would scan the token table twice — at corpus
    // scale that is two reads of the whole dataset for one rollup).
    // sequence(k, size) DESCENDS when size < k (the documented Spark
    // gotcha) — the per-k CASE guard emits an empty array instead.
    def gramArr(k: Int) = {
      val parts = (k - 1 to 0 by -1)
        .map(j => s"element_at(tk, i - $j)").mkString(", ")
      s"""CASE WHEN n_tokens >= $k THEN
            transform(sequence($k, CAST(size(tk) AS INT)),
              i -> named_struct('g', $k, 'gram', concat_ws(' ', $parts)))
          ELSE CAST(array() AS ARRAY<STRUCT<g: INT, gram: STRING>>) END"""
    }
    toks.where(col("n_tokens") >= 2)
      .select(col("doc_id"), explode(expr(
        s"concat(${gramArr(2)}, ${gramArr(3)})".replace('\n', ' '))).as("gg"))
      .select(col("doc_id"), col("gg.g").as("g"), col("gg.gram").as("gram"))
      .groupBy("doc_id", "g", "gram").count()
      .groupBy("doc_id", "g").agg(
        max("count").as("topc"), sum("count").as("total"),
        count(lit(1)).as("dst"))
      .groupBy("doc_id").agg(
        max(when(col("g") === 2, col("topc"))).as("top2"),
        max(when(col("g") === 2, col("total"))).as("tot2"),
        max(when(col("g") === 2, col("dst"))).as("dst2"),
        max(when(col("g") === 3, col("topc"))).as("top3"),
        max(when(col("g") === 3, col("total"))).as("tot3"),
        max(when(col("g") === 3, col("dst"))).as("dst3"))
  }

  /** DuckDB twin of [[repPerDoc]] (+ the `rtoks` token CTE): `rwide` has
    * the same six columns; shared by the x57 and x58 oracles.
    */
  private[graft] val duckRepCtes: String = """rtoks AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
    len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
rgrams AS (
  SELECT doc_id, 2 AS g, tk[i-1] || ' ' || tk[i] AS gram
  FROM rtoks, UNNEST(generate_series(2, n_tokens)) AS u(i)
  WHERE n_tokens >= 2
  UNION ALL
  SELECT doc_id, 3 AS g, tk[i-2] || ' ' || tk[i-1] || ' ' || tk[i] AS gram
  FROM rtoks, UNNEST(generate_series(3, n_tokens)) AS u(i)
  WHERE n_tokens >= 3
),
rcnt AS (
  SELECT doc_id, g, gram, count(*) AS c FROM rgrams GROUP BY 1, 2, 3
),
rperdoc AS (
  SELECT doc_id, g, max(c) AS topc, sum(c) AS total, count(*) AS dst
  FROM rcnt GROUP BY 1, 2
),
rwide AS (
  SELECT doc_id,
    max(CASE WHEN g = 2 THEN topc END) AS top2,
    max(CASE WHEN g = 2 THEN total END) AS tot2,
    max(CASE WHEN g = 2 THEN dst END) AS dst2,
    max(CASE WHEN g = 3 THEN topc END) AS top3,
    max(CASE WHEN g = 3 THEN total END) AS tot3,
    max(CASE WHEN g = 3 THEN dst END) AS dst3
  FROM rperdoc GROUP BY 1
)"""
}
