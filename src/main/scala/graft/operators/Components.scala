package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * cluster-assembly step behind near-dup dedup (the declared
  * `x14_dedup_clusters`; cf. the reference's dedup intent at
  * `extract_loan_detail.py:342-353`, window dedup, generalized to graph
  * components for corpus near-dup sets). Min-label propagation with
  * pointer jumping: each round every vertex takes the minimum label in
  * its neighborhood, then labels shortcut through one level of
  * indirection (`label := label(label)`), giving log-depth convergence
  * on path graphs (the BSP "hash-to-min" scheme of Rastogi et al. '13).
  *
  * Scale shape:
  *
  *   - Rounds run on the CONTRACTED graph: only vertices with at least
  *     one edge participate; isolated vertices rejoin at the end with
  *     their own id as the component. On a near-dup candidate graph the
  *     paired subset is orders of magnitude smaller than the corpus
  *     (most documents collide with nothing), so every per-round shuffle
  *     moves only the pair endpoints, never the full corpus.
  *   - Each round is one edge join + min-aggregation (propagate) and one
  *     label self-join (shortcut) — plain key-partitioned shuffles with
  *     no driver-side state beyond one convergence scalar per round.
  *   - Labels only decrease and `label(x) <= x` is invariant, so a round
  *     changed something iff `sum(label)` dropped; the first unchanged
  *     round is the fixpoint and iteration stops — identical output to
  *     the fixed `maxRounds` unroll (post-fixpoint rounds are
  *     identities), for the cost of one single-stage aggregation over
  *     the just-materialized labels per round.
  *   - Every round MATERIALIZES and truncates lineage: the shortcut
  *     references the propagated frame twice, so a lazy chain would grow
  *     the plan ~3× per round. In local-checkpoint mode the round's
  *     checkpoint is marked lazily and the convergence probe's
  *     aggregation doubles as the materializing job — one barrier per
  *     round, not two. With `checkpointDir = None` that is a
  *     `localCheckpoint` — executor-memory/disk resident, the
  *     fastest option, correct for local mode and short-lived jobs, but
  *     an executor loss mid-iteration loses blocks and kills the job on
  *     a real cluster. Passing a directory (HDFS/object store) switches
  *     to RELIABLE `checkpoint` into that path, which survives executor
  *     loss at the cost of a distributed write+read per round — the
  *     right default for a 1000-executor run.
  */
object Components {

  /** @param edges     undirected edge list (each pair listed once is
    *                  fine). PRECONDITION: endpoints are drawn from
    *                  `vertices` — an endpoint outside the universe would
    *                  still propagate its id as a label (the function
    *                  does not pay a per-run semi-join to police what the
    *                  callers' candidate-pair generators guarantee by
    *                  construction).
    * @param srcCol    edge source-vertex column in `edges`
    * @param dstCol    edge destination-vertex column in `edges`
    * @param vertices  full vertex universe (isolated vertices come back
    *                  as singleton components)
    * @param idCol     vertex-id column in `vertices` (also the output
    *                  key; any name except the reserved output column
    *                  `component`)
    * @param maxRounds propagation-round cap; with pointer jumping the
    *                  fixpoint needs O(log(longest path)) rounds and the
    *                  early stop makes the cap a safety bound, not a cost
    * @param checkpointDir None = eager localCheckpoint (local mode);
    *                  Some(dir) = reliable checkpoint for cluster runs.
    *                  NOTE: sets the session's SparkContext checkpoint
    *                  dir (Spark has no per-job setting) and leaves the
    *                  per-round checkpoint files behind — the returned
    *                  frame still reads the last one lazily — so point
    *                  it at a job-scoped path and delete it after the
    *                  results are consumed.
    * @return (idCol, component) — component = min vertex id reachable
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      vertices: DataFrame, idCol: String,
      maxRounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(idCol != "component",
      "idCol must not be named 'component' (the reserved output column)")
    checkpointDir.foreach(
      edges.sparkSession.sparkContext.setCheckpointDir)
    def materialize(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(true)
    // Loop-body variant: every materialized frame in the round loop is
    // immediately consumed by the convergence probe's aggregation, so
    // in LOCAL mode the checkpoint is marked lazily and the probe's
    // job doubles as the materialization — ONE barrier per round
    // instead of two (the probe's job persists the blocks; local
    // checkpoints save what the job computed, no recompute). RELIABLE
    // checkpoints stay eager: a lazy `checkpoint()` re-runs the RDD
    // from scratch when saving, which would double every round.
    def materializeOnProbe(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint(false)
    // internal working names so arbitrary caller column names (including
    // "id"/"label") can never collide with the loop's plumbing
    val id = "__cc_id"
    val lbl = "__cc_label"
    // the symmetrized edge list feeds every round's propagate join as a
    // cheap projection over the caller's (persisted) candidate pairs.
    // Deliberately NOT pre-shuffled onto the join key: the label table
    // is far smaller than the edges at every round, so AQE plans each
    // propagate as a broadcast join of the labels — the edge side never
    // exchanges at all, and a repartition+persist of the edges is pure
    // added cost (measured +40% on x41 at sf0.1). Were the per-round
    // label table ever too big to broadcast, pre-partitioning the edges
    // once (GraphX-style) becomes the right trade.
    val sym = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(
        edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
    // ROUND 1 FUSED INTO INITIALIZATION: with identity starting labels
    // the first propagate is just `min(v, min neighbor id)`, so the
    // contracted vertex set (= the groupBy keys), the identity label
    // table and the first propagate join collapse into ONE aggregation
    // over the symmetrized edges. This also drops the provably-futile
    // round-1 convergence probe: any edge (a,b) with a<b strictly drops
    // b's label below identity, so round 1 can never be the fixpoint on
    // a non-empty edge set (and on an empty set every frame below is
    // empty and round 2 confirms 0 == 0 immediately). Saves a distinct
    // shuffle, a join and two probe jobs per call — measured ~1.3 s of
    // x14's 3.6 s CC time at sf0.1.
    // prop1 is MATERIALIZED before the shortcut self-join: the join
    // references it twice, and on the first action the caller's edge
    // chain (pair generation, and in x41's case k-means + assignment
    // upstream of it) is persisted-but-not-yet-populated — a lazy prop1
    // would compute that whole chain once per join branch (measured ~3 s
    // doubled to ~6 s on x41 at sf0.1). One checkpoint runs it exactly
    // once and every later round reads the caller's now-warm cache.
    val prop1 = materialize(sym.groupBy(col("src"))
      .agg(min(col("dst")).as("nl"))
      .select(col("src").as(id), least(col("src"), col("nl")).as(lbl)))
    var labels = materializeOnProbe(prop1.as("p")
      .join(prop1.as("q"), col(s"p.$lbl") === col(s"q.$id"))
      .select(col(s"p.$id").as(id), col(s"q.$lbl").as(lbl)))
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col(lbl)), lit(0L))).head().getLong(0)
    var prevSum = labelSum(labels)
    var round = 1
    var converged = false
    while (round < maxRounds && !converged) {
      round += 1
      val nbrMin = sym.join(labels, col("dst") === col(id))
        .groupBy(col("src")).agg(min(col(lbl)).as("nl"))
      val propagated = labels.as("v")
        .join(nbrMin.as("m"), col(s"v.$id") === col("m.src"), "left")
        .select(col(s"v.$id").as(id),
          least(col(s"v.$lbl"), coalesce(col("m.nl"), col(s"v.$lbl")))
            .as(lbl))
      // shortcut: label := label(label). Labels are always ids of
      // contracted vertices (min over component members, all of which
      // have edges), so the inner self-join loses nothing.
      val next = materializeOnProbe(propagated.as("p")
        .join(propagated.as("q"), col(s"p.$lbl") === col(s"q.$id"))
        .select(col(s"p.$id").as(id), col(s"q.$lbl").as(lbl)))
      val nextSum = labelSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
        Console.err.println(s"[cc] round=$round labelSum=$nextSum " +
          s"converged=$converged")
    }
    // singletons (no edges) never changed: component = own id
    vertices.select(col(idCol))
      .join(labels.withColumnRenamed(id, idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col(lbl), col(idCol)).as("component"))
  }
}
