package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer TRAINING (Kudo, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates", ACL 2018 — the SentencePiece unigram algorithm; public)
  * — the OTHER tokenizer production pipelines ship next to BPE (x91):
  * seed a candidate piece vocabulary from weighted substring
  * frequencies, then alternate an E-step that segments every word under
  * the current piece probabilities with a Viterbi DP and an M-step that
  * re-estimates probabilities from the segmentation counts (hard-EM /
  * Viterbi-EM, the tractable exact-arithmetic variant of the full
  * forward-backward: expected counts stay INTEGERS, so the whole
  * trainer replays bit-for-bit in the oracle). Pieces that win no
  * segmentation drop out of the vocabulary — the algorithm's prune
  * step, which is what leaves multi-character pieces competing with
  * the single-character floor.
  *
  * Cross-engine parity is the x93/x36 fixed-point-log discipline:
  * piece log-probabilities are `floor(ln(c/t)·10⁶ + 0.5)` BIGINTs —
  * ONE libm call per scalar from exact-integer inputs, then the DP
  * sums integers and breaks ties on (score DESC, piece-count ASC,
  * segmentation-string ASC), a total order both engines replay. The
  * DuckDB oracle runs the identical DP as a chained-CTE chain
  * ([[OracleDpChain]] positions, MATERIALIZED — the d-CTEs reference
  * their predecessor twice, and inlining would double the plan per
  * position).
  *
  * Scale shape (the x91 discipline): training runs on the
  * vocabulary-sized word-TYPE table (Heaps' law), never the corpus;
  * the candidate vocabulary is CONSTANT-size by construction
  * ([[SeedSize]] + the alphabet) and lives as collected driver state
  * between rounds (the BPE merge-table discipline), so the per-round
  * E-step is a pure map over the word table against a literal
  * piece→logp map and the M-step is one map-side-combined aggregation
  * of the segmentations — one Spark job per round, constant driver
  * state. [[EmRounds]] is driver-sequenced like BPE's
  * merge rounds, but here rounds are a QUALITY knob (hard-EM converges
  * in a few), not a vocabulary-size knob — the 32k-piece production
  * case changes [[SeedSize]], not the round count, and every round's
  * cost is independent of it.
  */
object UnigramQueries {

  /** Longest candidate piece (characters). */
  private val MaxPiece = 4

  /** Seed vocabulary size: the top-N weighted substrings, UNIONed with
    * every single character so any word stays segmentable (the
    * coverage floor SentencePiece also enforces).
    */
  private val SeedSize = 24

  /** Hard-EM rounds (segment → re-estimate). */
  private val EmRounds = 2

  /** DP positions the ORACLE's chained CTEs cover — a static bound on
    * word length (the corpus generator tops out at 8; 16 leaves 2×
    * headroom). The engine-side fold has no such bound; a corpus with
    * longer words only needs this constant raised in the oracle text.
    */
  private val OracleDpChain = 16

  private val Sep = "\u0001" // the in-SQL chr(1), the x91 convention

  /** Vocabulary-sized training table — the x91 word-type discipline. */
  private def wordTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Frequency of every ≤ [[MaxPiece]]-char substring, weighted by word
    * corpus count — the seed candidate pool.
    */
  private def substrFreqs(wt: DataFrame): DataFrame =
    wt.select(col("cnt"), explode(expr(s"""
        flatten(transform(sequence(1, length(word)), i ->
          transform(sequence(1, least($MaxPiece, length(word) - i + 1)),
            l -> substring(word, i, l))))""".replace('\n', ' ')))
        .as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("c"))

  /** Seed selection: top [[SeedSize]] by (c DESC, piece) — a
    * distributed TakeOrdered, not a global window — plus every single
    * character (deduped; a char already in the top-N unions to the
    * same (piece, c) row).
    */
  private def seedVocab(sub: DataFrame): DataFrame =
    sub.orderBy(col("c").desc, col("piece")).limit(SeedSize)
      .unionByName(sub.filter(length(col("piece")) === 1))
      .distinct()

  /** Fixed-point log-probabilities from collected (piece, count) rows
    * — the M-step, computed on the DRIVER over constant-size state
    * (≤ [[SeedSize]] + alphabet rows, the BPE collected-merge-table
    * discipline): `floor(ln(c/t)·10⁶ + 0.5)` per piece, ONE
    * `Math.log` from exact-integer inputs — the same libm surface the
    * in-plan `ln` would use (Spark's Log expression is the identical
    * JVM call), so the oracle parity argument is unchanged while the
    * per-round broadcast-exchange jobs disappear.
    */
  private def vocabOf(counts: Seq[(String, Long)])
      : Seq[(String, Long, Long)] = {
    val t = counts.map(_._2).sum
    counts.map { case (p, c) =>
      (p, c, math.floor(
        math.log(c.toDouble / t.toDouble) * 1e6 + 0.5).toLong)
    }
  }

  /** The Viterbi DP as ONE whole-stage-codegen fold per word: state j
    * holds (score, piece-count, segmentation) for the best split of the
    * first j characters; each step maxes over the ≤ [[MaxPiece]]
    * predecessor states through the broadcast piece→lp map (`vm`).
    * Unreachable states (a position no surviving piece spans — possible
    * after round-1 pruning) carry a NULL score and are filtered out of
    * every later candidate set, exactly like the oracle's absent DP
    * rows. Tie-break: score DESC, piece-count ASC, segmentation ASC.
    */
  private def dpExpr: String = s"""
    element_at(
      aggregate(
        sequence(1, length(word)),
        array(named_struct('s', CAST(0 AS BIGINT), 'np', 0, 'r', '')),
        (acc, j) -> array_append(acc,
          aggregate(
            filter(
              transform(sequence(greatest(0, j - $MaxPiece), j - 1), i ->
                named_struct(
                  's', element_at(acc, i + 1).s +
                       element_at(vm, substring(word, i + 1, j - i)),
                  'np', element_at(acc, i + 1).np + 1,
                  'r', CASE WHEN element_at(acc, i + 1).r = ''
                       THEN substring(word, i + 1, j - i)
                       ELSE concat(element_at(acc, i + 1).r, chr(1),
                                   substring(word, i + 1, j - i)) END)),
              x -> x.s IS NOT NULL),
            named_struct('s', CAST(NULL AS BIGINT), 'np', 0, 'r', ''),
            (b, x) -> CASE WHEN b.s IS NULL OR x.s > b.s
                           OR (x.s = b.s AND (x.np < b.np
                           OR (x.np = b.np AND x.r < b.r)))
                      THEN x ELSE b END))),
      -1).r""".replace('\n', ' ')

  /** Segment any frame carrying a `word` column under a piece
    * vocabulary — a pure map against a LITERAL piece→lp map column
    * (built with Column lits, no string escaping surface), no shuffle
    * and no broadcast-exchange job. Shared by the trainer's E-step,
    * the serve encode, and the streaming drain (st21).
    */
  private[graft] def segmentTypes(words: DataFrame,
      vocab: Seq[(String, Long, Long)]): DataFrame =
    words.withColumn("vm",
        map(vocab.flatMap { case (p, _, lp) =>
          Seq(lit(p), lit(lp)) }: _*))
      .withColumn("repr", expr(dpExpr))
      .drop("vm")

  /** The trainer's E-step over the weighted word-type table. */
  private def segment(wt: DataFrame,
      vocab: Seq[(String, Long, Long)]): DataFrame =
    segmentTypes(wt, vocab).select(col("word"), col("cnt"), col("repr"))

  /** M-step counts: corpus-weighted piece usage in the segmentation —
    * one map-side-combined aggregation collapsing to ≤ vocabulary-size
    * rows, collected as the round's driver state. Pieces that won
    * nowhere simply don't appear — the prune.
    */
  private def stepCounts(seg: DataFrame): Seq[(String, Long)] =
    seg.select(col("cnt"), explode(split(col("repr"), Sep)).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("c"))
      .collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("c")))
      .toSeq

  /** Run the trainer; returns (final vocabulary, the corpus segmented
    * UNDER that final vocabulary) — the vocabulary is the model file
    * analog, and the segmentation is what shipping the model produces
    * (one more E-step past the last M-step — the encode a production
    * pipeline runs, so the self-contained x98 and the served x98s are
    * row-identical by construction). Per round: ONE aggregation job
    * whose result is constant-size driver state (the BPE trainer's
    * shape — here ≤ SeedSize + alphabet rows instead of one argmax
    * row).
    */
  private[graft] def trainLoop(s: SparkSession, d: String)
      : (Seq[(String, Long, Long)], DataFrame) = {
    val wt = wordTable(s, d).transform(graft.Caches.scoped)
    var vocab = vocabOf(
      seedVocab(substrFreqs(wt)).select(col("piece"), col("c"))
        .collect()
        .map(r => (r.getAs[String]("piece"), r.getAs[Long]("c")))
        .toSeq)
    for (_ <- 1 to EmRounds)
      vocab = vocabOf(stepCounts(segment(wt, vocab)))
    (vocab, segment(wt, vocab))
  }

  /** The trained piece table as a frame — x97's output and the
    * artifact [[AuditServe.prepare]] persists (the tokenizer model
    * file, the `bpemerges` sibling).
    */
  private[graft] def pieceTable(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    trainLoop(s, d)._1.toDF("piece", "cnt", "lp_micro")
      .orderBy(col("cnt").desc, col("piece"))
  }

  /** The persisted piece table as collected driver state (≤ vocab
    * rows) — the model-file read every serve consumer starts from.
    */
  private[graft] def servedPieces(s: SparkSession,
      d: String): Seq[(String, Long, Long)] =
    AuditServe.piecesFrom(s, d).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("cnt"),
        r.getAs[Long]("lp_micro"))).toSeq

  /** Serve-path encode: segment the corpus under the PERSISTED piece
    * table (constant-size driver state read from the artifact),
    * skipping the trainer's rounds entirely — the x92s discipline.
    */
  private[graft] def encodedFromServe(s: SparkSession,
      d: String): DataFrame =
    segment(wordTable(s, d), servedPieces(s, d))

  // ── oracle generation: the same trainer as chained MATERIALIZED
  // CTEs (inlining would re-expand each DP level's double reference).

  private def vocabCte(r: Int, src: String): String = s"""v$r AS MATERIALIZED (
  SELECT piece, c,
    CAST(floor(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS lp
  FROM (SELECT piece, c, sum(c) OVER () AS t FROM ($src))
)"""

  /** Edges + DP chain + segmentation under vocabulary v`r`. */
  private def dpCtes(r: Int): String = {
    val parts = Seq.newBuilder[String]
    parts += s"""ed$r AS MATERIALIZED (
  SELECT w.word, i - 1 AS i, i - 1 + l AS j, v.lp,
         substring(w.word, i, l) AS piece
  FROM wt w
  CROSS JOIN unnest(generate_series(1, length(w.word))) AS t(i)
  CROSS JOIN unnest(generate_series(1, $MaxPiece)) AS u(l)
  JOIN v$r v ON v.piece = substring(w.word, i, l)
  WHERE i + l - 1 <= length(w.word)
)"""
    parts += s"d${r}_0 AS MATERIALIZED (SELECT word, 0 AS pos, " +
      "CAST(0 AS BIGINT) AS s, 0 AS np, '' AS r FROM wt)"
    for (j <- 1 to OracleDpChain)
      parts += s"""d${r}_$j AS MATERIALIZED (
  SELECT word, pos, s, np, r FROM d${r}_${j - 1}
  UNION ALL
  SELECT word, $j AS pos, s, np, r FROM (
    SELECT e.word, d.s + e.lp AS s, d.np + 1 AS np,
           CASE WHEN d.r = '' THEN e.piece ELSE d.r || chr(1) || e.piece END AS r,
           row_number() OVER (PARTITION BY e.word ORDER BY d.s + e.lp DESC,
             d.np + 1 ASC,
             CASE WHEN d.r = '' THEN e.piece ELSE d.r || chr(1) || e.piece END ASC) AS rn
    FROM ed$r e JOIN d${r}_${j - 1} d ON d.word = e.word AND d.pos = e.i
    WHERE e.j = $j) WHERE rn = 1
)"""
    parts += s"seg$r AS MATERIALIZED (SELECT word, r AS repr " +
      s"FROM d${r}_$OracleDpChain WHERE pos = length(word))"
    parts.result().mkString(",\n")
  }

  /** One EM round: DP under v`r`, counts, re-estimated v`r+1`. */
  private def roundCtes(r: Int): String =
    Seq(dpCtes(r),
      s"""c$r AS MATERIALIZED (
  SELECT piece, CAST(sum(cnt) AS BIGINT) AS c FROM (
    SELECT wt.cnt, unnest(string_split(s.repr, chr(1))) AS piece
    FROM seg$r s JOIN wt USING (word)) GROUP BY 1)""",
      vocabCte(r + 1, s"SELECT piece, c FROM c$r")).mkString(",\n")

  /** Shared CTE prefix: word table → seed vocabulary → EmRounds
    * (edges → DP chain → segmentation → counts → re-estimated vocab).
    */
  private def oracleCtes: String = {
    val seedSrc = s"""SELECT piece, c FROM (
      SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rn
      FROM sub0) WHERE rn <= $SeedSize OR length(piece) = 1"""
    (Seq(
      """wt AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE length(word) > 0 GROUP BY 1
)""",
      s"""sub0 AS MATERIALIZED (
  SELECT substring(word, i, l) AS piece, CAST(sum(cnt) AS BIGINT) AS c
  FROM wt
  CROSS JOIN unnest(generate_series(1, length(word))) AS t(i)
  CROSS JOIN unnest(generate_series(1, $MaxPiece)) AS u(l)
  WHERE i + l - 1 <= length(word)
  GROUP BY 1
)""",
      vocabCte(1, seedSrc)) ++ (1 to EmRounds).map(roundCtes))
      .mkString(",\n")
  }

  private def trainOracle: String =
    s"WITH $oracleCtes\nSELECT piece, c AS cnt, lp AS lp_micro " +
      s"FROM v${EmRounds + 1} ORDER BY cnt DESC, piece"

  /** Fertility of the corpus segmented under the FINAL vocabulary —
    * one more DP chain past the last M-step (the encode shipping the
    * model runs), shared verbatim by x98 and its serve twin x98s.
    */
  private[graft] def fertilityOracle: String = s"""WITH $oracleCtes,
${dpCtes(EmRounds + 1)},
enc AS MATERIALIZED (
  SELECT word, CAST(len(string_split(repr, chr(1))) AS BIGINT) AS n_sub
  FROM seg${EmRounds + 1}),
occ AS MATERIALIZED (
  SELECT source, word, CAST(count(*) AS BIGINT) AS w_cnt FROM (
    SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE length(word) > 0 GROUP BY 1, 2)
SELECT source,
  CAST(sum(w_cnt) AS BIGINT) AS n_words,
  CAST(sum(w_cnt * n_sub) AS BIGINT) AS n_subwords,
  CAST(CAST(sum(w_cnt * n_sub) AS BIGINT) AS DOUBLE)
    / CAST(CAST(sum(w_cnt) AS BIGINT) AS DOUBLE) AS fertility
FROM occ JOIN enc USING (word)
GROUP BY source ORDER BY source"""

  def defs: Map[String, QueryDef] = Map(
    // ── The unigram trainer: the piece table a SentencePiece-style
    // tokenizer ships (piece, final count, fixed-point log-prob).
    "x97_unigram_train" -> QueryDef(
      (s, d) => pieceTable(s, d),
      Some(trainOracle),
      s"unigram-LM (SentencePiece) tokenizer training: $EmRounds " +
        "hard-EM rounds over the word-type table"),

    // ── The x92 fertility twin under the unigram model: the metric
    // that ARBITRATES between the two trained tokenizers per corpus
    // slice (same schema and spelling as x92, so the two rows compare
    // directly).
    "x98_unigram_fertility" -> QueryDef(
      (s, d) => {
        val (_, seg) = trainLoop(s, d)
        BpeQueries.encodeFertility(s, d, seg)
      },
      Some(fertilityOracle),
      "per-source fertility of the corpus under the trained unigram " +
        "model (the x92 comparison row)"),

    // ── Serve twin: encode under the PERSISTED piece table (constant
    // driver state from the artifact), skipping the trainer's rounds.
    // Row-identical to x98 (shared oracle), the x92s discipline.
    "x98s_unigram_serve" -> QueryDef(
      (s, d) => {
        AuditServe.prepare(s, d)
        BpeQueries.encodeFertility(s, d, encodedFromServe(s, d))
      },
      Some(fertilityOracle),
      "per-source unigram fertility served from the persisted piece " +
        "table"))
}
