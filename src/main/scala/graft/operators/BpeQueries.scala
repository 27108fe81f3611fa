package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge TRAINING (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016 —
  * public algorithm): x38 prices ONE pair-count round at the word level;
  * this module runs the actual character-level trainer loop — N rounds
  * of (count adjacent symbol pairs) → (pick the most frequent) → (merge
  * it everywhere) — and emits the learned merge table, which IS a BPE
  * tokenizer's model file.
  *
  * The scalable spelling (the one production trainers use): train on the
  * WORD-TYPE table, not the corpus — `(word, count)` is vocabulary-sized
  * (Heaps' law: sublinear in corpus size), and every pair count weights
  * by the word's corpus frequency, so the result is identical to
  * corpus-level training at a tiny fraction of the work. Each round is
  * one explode + map-side-combined aggregation over that table plus the
  * selection of a SINGLE pair; the only driver state is that one pair
  * per round (the d=64 PCA-state precedent — constant-size by
  * construction, never data-proportional). At 100 TB the word table is
  * 10⁷-10⁸ rows and the loop shape is unchanged; real trainers run
  * thousands of identical rounds where this query runs `Rounds`.
  *
  * Merge application is the parity trick: a word's symbol segmentation
  * is kept as the word with `chr(1)` separators (a character that cannot
  * occur inside space-split words), so applying merge (a, b) is ONE
  * `replace(repr, 'a␁b', 'ab')` — and both engines' `replace` scans
  * left-to-right non-overlapping, which is exactly BPE's simultaneous
  * merge-application semantics ("x␁x␁x" under (x, x) → "xx␁x", never
  * "x␁xx"). Pair selection breaks count ties by binary string order on
  * both engines. Everything else is integer counts, so the whole
  * trainer replays bit-for-bit in the oracle as `Rounds` chained CTE
  * triples.
  */
object BpeQueries {
  private val Rounds = 6
  private val Sep = "\u0001" // the JVM twin of the in-SQL chr(1) separator

  /** Vocabulary-sized training table: distinct words with corpus counts
    * and the initial character segmentation.
    */
  private def wordTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("repr", expr(
        """concat_ws(chr(1), transform(sequence(1, length(word)),
           i -> substring(word, i, 1)))""".replace('\n', ' ')))

  /** Adjacent symbol pairs of the current segmentation, weighted by word
    * frequency. `sequence(a, b)` DESCENDS when b < a, so single-symbol
    * words are guarded to emit nothing instead of a reversed fan-out.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words.select(col("cnt"), explode(expr(
        """CASE WHEN size(split(repr, chr(1))) >= 2 THEN
             transform(sequence(1, size(split(repr, chr(1))) - 1),
               i -> concat(element_at(split(repr, chr(1)), i), chr(1),
                           element_at(split(repr, chr(1)), i + 1)))
           ELSE CAST(array() AS ARRAY<STRING>) END""".replace('\n', ' ')))
        .as("pair"))
      .groupBy("pair").agg(sum(col("cnt")).as("n"))

  /** The learned merge table: one row per round — (round, sym_a, sym_b,
    * merged, n), where n is the pair's weighted count when it was
    * chosen. Stops early if the pair supply is exhausted (degenerate
    * corpora), so the row count is `min(Rounds, available merges)`.
    */
  private[graft] def trainMerges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w0 = wordTable(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var words = w0
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= Rounds && !exhausted) {
      val best = pairCounts(words)
        .orderBy(col("n").desc, col("pair")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best.head.getAs[String]("pair")
        val n = best.head.getAs[Long]("n")
        val Array(a, b) = pair.split(Sep, 2)
        merges += ((r.toLong, a, b, a + b, n))
        words = words.withColumn("repr",
          call_function("replace", col("repr"), lit(pair), lit(a + b)))
        r += 1
      }
    }
    merges.result()
      .toDF("round", "sym_a", "sym_b", "merged", "n")
      .orderBy("round")
  }

  /** The oracle replays the identical loop as `Rounds` chained CTE
    * triples (pairs → best-by-(n DESC, pair) → replace-everywhere).
    */
  private def oracle: String = {
    def roundCtes(r: Int): String = s"""
p$r AS (
  SELECT pr AS pair, CAST(sum(cnt) AS BIGINT) AS n FROM (
    SELECT cnt, unnest(CASE WHEN len(syms) >= 2 THEN
      list_transform(generate_series(1, len(syms) - 1),
        i -> syms[i] || chr(1) || syms[i + 1])
      ELSE [] END) AS pr
    FROM (SELECT cnt, string_split(repr, chr(1)) AS syms FROM w${r - 1})
  ) GROUP BY 1
),
b$r AS (SELECT pair, n FROM p$r ORDER BY n DESC, pair LIMIT 1),
w$r AS (
  SELECT word, cnt,
    replace(repr, (SELECT pair FROM b$r),
      replace((SELECT pair FROM b$r), chr(1), '')) AS repr
  FROM w${r - 1}
)"""
    val selects = (1 to Rounds).map(r => s"""
  SELECT CAST($r AS BIGINT) AS round,
    string_split(pair, chr(1))[1] AS sym_a,
    string_split(pair, chr(1))[2] AS sym_b,
    replace(pair, chr(1), '') AS merged, n
  FROM b$r""").mkString(" UNION ALL ")
    s"""
WITH w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
    array_to_string(list_transform(generate_series(1, length(word)),
      i -> substring(word, i, 1)), chr(1)) AS repr
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE length(word) > 0
  GROUP BY word
),
${(1 to Rounds).map(roundCtes).mkString(",")}
SELECT * FROM ($selects) ORDER BY round"""
  }

  def defs: Map[String, QueryDef] = Map(
    // ── The BPE trainer loop: the merge table a subword tokenizer ships.
    "x91_bpe_train" -> QueryDef(
      (s, d) => trainMerges(s, d),
      Some(oracle),
      s"character-level BPE merge training, $Rounds rounds over the " +
        "frequency-weighted word-type table"))
}
