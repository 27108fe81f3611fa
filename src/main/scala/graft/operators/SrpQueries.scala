package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sign-random-projection (hyperplane) LSH over the `embeddings` table —
  * the LSH-bucketed ANN variant, complementing the IVF family: where IVF
  * learns its partitioning from the data (k-means centroids, x10-x12),
  * SRP's partitioning is DATA-INDEPENDENT — H fixed hyperplanes split the
  * space into sign-pattern buckets (Charikar, "Similarity Estimation
  * Techniques from Rounding Algorithms", STOC 2002: P[bit match] =
  * 1 − θ/π for angle θ, so banded sign bits are an LSH family for cosine).
  * That independence is the operational difference at 100 TB: no training
  * pass, no index artifact, no retrain-on-drift — a new vector's buckets
  * are a pure map-side function of the vector, so ingest is embarrassingly
  * parallel from day one (the same property x07 exploits for text via
  * SimHash; SRP IS SimHash for embedding vectors).
  *
  * Banding is the classic OR-of-ANDs amplification: `Bands` bands of
  * `BitsPerBand` sign bits each; a candidate surfaces if it matches a
  * probe in ANY band (r-bit AND within a band, OR across bands). Probing
  * is MULTI-PROBE (Lv et al., "Multi-Probe LSH", VLDB 2007): each probe
  * also queries every Hamming-1 perturbation of its band key — a
  * probe-side-only fan-out of `BitsPerBand + 1` keys per band that buys
  * back the recall a single sign-bit flip would otherwise cost, without
  * touching the corpus side (on this near-orthogonal corpus it lifts
  * top-k recall from ~5% to the IVF/PQ family's range at ~quarter-corpus
  * candidate cost). The exact cosine rescoring of the surfaced candidates
  * then reuses the family's integer-quantized cosine, so the only
  * approximation is WHICH candidates surface — audited against the x09
  * brute-force truth by `x90_srp_recall`.
  *
  * Determinism/parity: hyperplane component (h, i) is the integer
  * `((h+1)·2654435761 + i·40503) mod 2039 − 1019` — a Weyl-style mixed
  * congruence over a prime modulus (all operands positive before `mod`,
  * so Spark's `%` and DuckDB's `%` agree), giving pseudo-random weights
  * in [−1019, 1019] that both engines derive from the same closed form
  * (no RNG, no shipped weight table). The sign bit compares an exact
  * int64 dot product (|dot| ≤ 64·|qe|·1019 < 2^63) against 0, band keys
  * pack bits with exact shifts, and the rescoring cosine is the module's
  * shared exact spelling — so the oracle replays the whole path
  * bit-for-bit.
  *
  * Scale shape: key derivation is ONE map-only pass (4096 integer
  * multiply-adds per row, fully inside whole-stage codegen, no shuffle of
  * the corpus beyond the (band, key) candidate equi-join); the candidate
  * join is probe-side-broadcast; the per-(band, key) fan-out is hard-
  * bounded by the `bandCap` skew lever (dead/constant vectors all hash to
  * the same key per band — the hot-bucket pathology — and the cap keeps
  * the lowest vec_ids, surfacing overflow as reduced recall in x90, never
  * as a hot task).
  */
object SrpQueries {
  import SimilarityQueries.{NQueries, K}

  private val Bands = 8
  private val BitsPerBand = 8 // H = 64 hyperplanes, 256 keys per band
  private val Dims = 64       // embeddings.parquet vector length

  /** Cap for the declared capped-twin `x89c_srp_bandcap` (the
    * x06c/x08c/x11c analog on the SRP path): mean (band, key) bucket
    * holds n/256 vectors per band, but sign-pattern buckets skew hard on
    * clustered corpora, so a cap of 8 bites on the driver data at every
    * SF while leaving most buckets exact.
    */
  private val TwinBandCap = 8

  /** (vec_id, qe, qn, band, bkey) — one row per (vector, band). The
    * whole derivation is a per-row expression: for each of the H
    * hyperplanes an exact integer dot against the closed-form weights,
    * then per band an exact bit-pack of the `BitsPerBand` sign bits.
    * dt = 0 packs as bit 1 on both engines (`>= 0`), which is what pins
    * the zero vector to the all-ones key in every band. The derivation
    * runs as the native [[graft.functions.SrpBandKeys]] expression —
    * the triple-nested `aggregate` HOF spelling it replaces interprets
    * ~bands·bits·d lambda nodes per row, which priced st18's
    * plan (no whole-stage codegen in the streaming sink) at 50× the
    * batch cost; the oracle keeps the composable spelling and
    * SrpBandKeysSpec pins bit-equality between the two.
    */
  private[graft] def bandKeys(e: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureInstalled(e.sparkSession)
    e.withColumn("bkeys",
        expr(s"srp_band_keys(qe, $Bands, $BitsPerBand, $Dims)"))
      .select(col("vec_id"), col("qe"), col("qn"),
        posexplode(col("bkeys")).as(Seq("band", "bkey")))
  }

  /** The HOF twin of [[graft.functions.SrpBandKeys]], kept ONLY as the
    * equivalence reference for SrpBandKeysSpec (the oracle's algebra in
    * Spark spelling — proving the native expression against it proves
    * it against the DuckDB CTEs).
    */
  private[graft] def hofBandKeysExpr: String = s"""
        transform(sequence(0, ${Bands - 1}), b ->
          aggregate(sequence(0, ${BitsPerBand - 1}), CAST(0 AS BIGINT),
            (acc, r) -> acc + CASE WHEN
              aggregate(sequence(1, $Dims), CAST(0 AS BIGINT),
                (a, i) -> a + element_at(qe, i) *
                  (((b * $BitsPerBand + r + 1) * 2654435761
                    + i * 40503) % 2039 - 1019))
              >= 0 THEN shiftleft(CAST(1 AS BIGINT), r)
              ELSE CAST(0 AS BIGINT) END))""".replace('\n', ' ')

  /** The `bandCap` skew lever — per-(band, key) survivor cap, lowest
    * vec_ids kept (the [[SimilarityQueries.cappedByBucket]] discipline):
    * deterministic, oracle-replayable, and overflow surfaces as missing
    * candidates (reduced recall), never as an unbounded hot task.
    */
  private def cappedByBandKey(keys: DataFrame, cap: Option[Int]): DataFrame =
    cap.fold(keys) { c =>
      keys.withColumn("__krank", row_number().over(
          Window.partitionBy("band", "bkey").orderBy("vec_id")))
        .filter(col("__krank") <= c)
        .drop("__krank")
    }

  /** SRP-LSH top-K: probes (the family's fixed NQueries lowest vec_ids)
    * collect candidates sharing ANY (band, key) bucket, then exact-cosine
    * rescoring ranks them. `n_bands` (how many bands matched) rides along
    * as the LSH diagnostic — it is the integer evidence count behind each
    * candidate. Probes are never capped; only the corpus side is.
    */
  private[graft] def srpTopK(e: DataFrame,
      bandCap: Option[Int] = None): DataFrame = {
    graft.GraftExtensions.ensureInstalled(e.sparkSession) // rescoring uses dot_long
    val keysFull = bandKeys(e)
      .transform(graft.Caches.scoped)
    val corpus = cappedByBandKey(
      keysFull.select(col("vec_id"), col("band"), col("bkey")), bandCap)
    // multi-probe fan-out: per (probe, band), the exact key plus its
    // BitsPerBand Hamming-1 perturbations — 9 keys/band, probe side only
    val probes = keysFull.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("band"),
        explode(expr(s"""transform(sequence(0, $BitsPerBand), f ->
          CASE WHEN f = 0 THEN bkey
          ELSE bkey ^ shiftleft(CAST(1 AS BIGINT), f - 1) END)"""
          .replace('\n', ' '))).as("bkey"))
    // a candidate's one key per band matches at most one of the 9 probe
    // keys, so n_bands stays "bands matched (within Hamming-1)"
    val cand = corpus.join(broadcast(probes), Seq("band", "bkey"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(count(lit(1)).as("n_bands"))
    val qv = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("qe").as("q_qe"),
        col("qn").as("q_qn"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), col("vec_id"))
    cand.join(broadcast(qv), "q_id")
      .join(e.select(col("vec_id"), col("qe"), col("qn")), "vec_id")
      .withColumn("cos",
        expr(SimilarityQueries.sparkCos("q_qe", "q_qn", "qe", "qn")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"), col("n_bands"))
      .orderBy("q_id", "rank")
  }

  /** The SRP key-derivation CTEs (`hp`, `bk`) plus the probe CTE `p` —
    * the oracle twin of [[bandKeys]], shared verbatim by x89, x89c and
    * x90 so one SQL text pins the key algebra for all three rows.
    */
  private val duckSrpCtes = s"""
hp AS (
  SELECT e.vec_id, h.h,
    CAST(list_sum(list_transform(generate_series(1, $Dims),
      i -> qe[i] * (((h.h + 1) * 2654435761 + i * 40503) % 2039 - 1019)))
      AS BIGINT) AS dt
  FROM e CROSS JOIN UNNEST(generate_series(0, ${Bands * BitsPerBand - 1}))
    AS h(h)
),
bk AS (
  SELECT vec_id, h // $BitsPerBand AS band,
    CAST(sum(CASE WHEN dt >= 0 THEN 1 << (h % $BitsPerBand) ELSE 0 END)
      AS BIGINT) AS bkey
  FROM hp GROUP BY 1, 2
),
p AS (
  SELECT q_id, band,
    CASE WHEN f.f = 0 THEN bkey
      ELSE xor(bkey, CAST(1 AS BIGINT) << (f.f - 1)) END AS bkey
  FROM (SELECT vec_id AS q_id, band, bkey FROM bk
        WHERE vec_id < $NQueries) b0
  CROSS JOIN UNNEST(generate_series(0, $BitsPerBand)) AS f(f)
)"""

  /** Candidate + rescoring oracle SQL over a corpus-keys CTE `corpusCte`
    * (bk for the exact row, the capped view for the twin).
    */
  private def duckSrpTopK(corpusCte: String): String = s"""
cand AS (
  SELECT p.q_id, c.vec_id AS neighbor_id, CAST(count(*) AS BIGINT) AS n_bands
  FROM p JOIN $corpusCte c ON p.band = c.band AND p.bkey = c.bkey
    AND c.vec_id != p.q_id
  GROUP BY 1, 2
),
scored AS (
  SELECT cand.q_id, cand.neighbor_id, cand.n_bands,
    ${SimilarityQueries.duckCos("qv.qe", "qv.qn", "cv.qe", "cv.qn")} AS cos
  FROM cand JOIN e qv ON qv.vec_id = cand.q_id
            JOIN e cv ON cv.vec_id = cand.neighbor_id
),
topk AS (
  SELECT q_id, CAST(rn AS BIGINT) AS rank, neighbor_id, cos, n_bands
  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
          ORDER BY cos DESC, neighbor_id) AS rn FROM scored)
  WHERE rn <= $K
)"""

  /** Per-(band, key) population rollup — the state the streaming twin
    * `st18_stream_srp_buckets` maintains: (count, min vec_id) monoids
    * keyed by the ≤ Bands·2^BitsPerBand sign buckets. Operationally this
    * IS the bandCap sizing signal: a bucket whose n_vecs runs away (the
    * dead-vector all-ones key, a template-flood sign pattern) is the one
    * the capped path truncates, and the stream surfaces it continuously
    * without any index artifact to refresh.
    */
  private[graft] def bucketStats(e: DataFrame): DataFrame =
    bandKeys(e)
      .groupBy(col("band").cast("bigint").as("band"), col("bkey"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec_id"))

  /** Batch oracle of [[bucketStats]] — the full-corpus rollup over the
    * shared key CTEs; drained stream state must equal it at any arrival
    * order (count/min are commutative monoids).
    */
  private[graft] lazy val bucketStatsSql: String = s"""
WITH ${SimilarityQueries.duckQuantizedCte},
$duckSrpCtes
SELECT CAST(band AS BIGINT) AS band, bkey,
  CAST(count(*) AS BIGINT) AS n_vecs,
  CAST(min(vec_id) AS BIGINT) AS min_vec_id
FROM bk GROUP BY 1, 2 ORDER BY band, bkey"""

  private val x89Oracle = s"""
WITH ${SimilarityQueries.duckQuantizedCte},
$duckSrpCtes,
${duckSrpTopK("bk").stripPrefix("\n")}
SELECT q_id, rank, neighbor_id, cos, n_bands FROM topk
ORDER BY q_id, rank"""

  private val x89cOracle = s"""
WITH ${SimilarityQueries.duckQuantizedCte},
$duckSrpCtes,
bkc AS (
  SELECT vec_id, band, bkey FROM (
    SELECT *, row_number() OVER (PARTITION BY band, bkey
      ORDER BY vec_id) AS brn FROM bk)
  WHERE brn <= $TwinBandCap
),
${duckSrpTopK("bkc").stripPrefix("\n")}
SELECT q_id, rank, neighbor_id, cos, n_bands FROM topk
ORDER BY q_id, rank"""

  /** x90 oracle: x09's brute-force truth LEFT-joined against the SRP
    * retrieval; recall = hits / possible as one exact-integer division
    * (guarded, both engines' only DOUBLE op).
    */
  private val x90Oracle = s"""
WITH ${SimilarityQueries.duckQuantizedCte},
$duckSrpCtes,
${duckSrpTopK("bk").stripPrefix("\n")},
bp AS (
  SELECT q.q_id, e2.vec_id AS neighbor_id,
    ${SimilarityQueries.duckCos("q.q_qe", "q.q_qn", "e2.qe", "e2.qn")} AS cos
  FROM (SELECT vec_id AS q_id, qe AS q_qe, qn AS q_qn FROM e
        WHERE vec_id < $NQueries) q
  JOIN e e2 ON e2.vec_id != q.q_id
),
brute AS (
  SELECT q_id, neighbor_id
  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
          ORDER BY cos DESC, neighbor_id) AS rn FROM bp)
  WHERE rn <= $K
)
SELECT CAST(count(DISTINCT b.q_id) AS BIGINT) AS n_probes,
  CAST($K AS BIGINT) AS k,
  CAST(count(*) AS BIGINT) AS possible,
  CAST(coalesce(sum(CASE WHEN t.q_id IS NOT NULL THEN 1 ELSE 0 END), 0)
    AS BIGINT) AS hits,
  CASE WHEN count(*) = 0 THEN CAST(0.0 AS DOUBLE)
    ELSE CAST(coalesce(sum(CASE WHEN t.q_id IS NOT NULL THEN 1 ELSE 0 END),
           0) AS DOUBLE) / CAST(count(*) AS DOUBLE) END AS recall
FROM brute b LEFT JOIN topk t
  ON b.q_id = t.q_id AND b.neighbor_id = t.neighbor_id"""

  def defs: Map[String, QueryDef] = Map(
    // ── SRP-LSH ANN: hyperplane sign-bucket candidates, exact rescoring.
    "x89_srp_lsh_ann" -> QueryDef(
      (s, d) => srpTopK(SimilarityQueries.quantizedCached(s, d)),
      Some(x89Oracle),
      "SRP (hyperplane) LSH ANN: banded sign-bit buckets, exact cosine rescoring"),

    // ── The capped twin: the shape a 100 TB user actually runs when
    // sign-pattern buckets skew (the x06c/x08c/x11c discipline).
    "x89c_srp_bandcap" -> QueryDef(
      (s, d) => srpTopK(SimilarityQueries.quantizedCached(s, d),
        Some(TwinBandCap)),
      Some(x89cOracle),
      s"x89 with the bandCap=$TwinBandCap skew lever engaged (capped oracle)"),

    // ── Recall audit: SRP retrieval vs the x09 brute-force truth.
    "x90_srp_recall" -> QueryDef(
      (s, d) => {
        val e = SimilarityQueries.quantizedCached(s, d)
        val srp = srpTopK(e).select(col("q_id"), col("neighbor_id"))
          .withColumn("hit", lit(1))
        val brute = SimilarityQueries.bruteTopK(e)
          .select(col("q_id"), col("neighbor_id"))
        brute.join(srp, Seq("q_id", "neighbor_id"), "left")
          .agg(
            countDistinct(col("q_id")).as("n_probes"),
            count(lit(1)).as("possible"),
            coalesce(sum(col("hit")), lit(0)).cast("bigint").as("hits"))
          .withColumn("k", lit(K.toLong))
          .withColumn("recall", expr(
            """CASE WHEN possible = 0 THEN CAST(0.0d AS DOUBLE)
               ELSE CAST(hits AS DOUBLE) / CAST(possible AS DOUBLE)
               END""".replace('\n', ' ')))
          .select(col("n_probes"), col("k"), col("possible"), col("hits"),
            col("recall"))
      },
      Some(x90Oracle),
      "LSH recall audit: SRP top-k hits over the brute-force truth set"))
}
