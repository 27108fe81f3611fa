package graft

/** Pins the persist/unpersist discipline (Caches.scope): after a scoped
  * run of any registry query, the SparkContext holds NO persisted RDDs
  * beyond what existed before the run — neither `persist`ed frames
  * (released via the tracked Dataset handles) nor `localCheckpoint`
  * backings (released by the scope-end sweep). A long-lived session
  * embedding the registry must not depend on a harness-side
  * `clearCache()` to stay bounded.
  *
  * The query list covers every persist-taking builder family: LSH/
  * n-gram dedup, BSP connected components (checkpointing), the IVF/PQ/
  * SRP similarity stack, CSLS, the iterative graph rounds
  * (checkpointing), BM25, BPE training (checkpointing), audio VAD, the
  * corpus pipeline, and the flagship join pipeline.
  */
class CacheScopeSpec extends SparkSpec {

  private val covered = Seq(
    "x06_dedup_minhash_lsh",  // DedupQueries: lshSigs/bands persists
    "x08_ngram_jaccard",      // DedupQueries: shingle df persists
    "x14_dedup_clusters",     // Components BSP: persists + checkpoints
    "x12_ann_ivf_search",     // SimilarityQueries: corpus/centroids/assignment
    "x41_embed_dedup_clusters", // bucket-local union-find chain
    "x87_csls_rescore",       // pair-table persist
    "x81_pq_codebooks",       // PqQueries persists
    "x89_srp_lsh_ann",        // SrpQueries band-key persist
    "x46_part_pagerank",      // GraphQueries: persists + localCheckpoints
    "x61_label_communities",  // label rounds
    "x65_bm25_rank",          // PipelineQueries persists
    "x91_bpe_train",          // BpeQueries: word table + checkpoints
    "x97_unigram_train",      // UnigramQueries: word-table persist
    "x99_ivf_coarse_route",   // two-level router: fine + coarse persists
    "x46s_pagerank_serve",    // GraphServe transition persist + rounds
    "x65s_bm25_serve",        // postings persist
    "mm03_phash_neardup",     // rebuilt banded-Hamming join
    "mm04_audio_vad",         // Multimodal window persist
    "corpus_curate",          // corpus pipeline
    "loan_detail")            // flagship joins

  test("scoped runs leave zero new persisted RDDs behind") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    for (name <- covered) {
      val n = Graft.runScoped(name, spark, sf)(_.count())
      assert(n > 0, s"$name returned no rows")
      val leaked = spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !before.contains(id) }
      assert(leaked.isEmpty,
        s"$name leaked ${leaked.size} persisted RDDs: " +
          leaked.map { case (id, r) => s"$id:${r.name}" }.mkString(", "))
    }
  }

  test("a closing scope does not sweep a concurrent scope's mid-flight " +
      "blocks; the last closer drains everything") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // Scope B opens, persists AND localCheckpoints, then parks at a
    // barrier while scope A (a full checkpoint-taking query) opens and
    // closes on another thread. Under the pre-fix global sweep, A's
    // close would unpersist B's checkpoint backing and B's later read
    // would die with missing-checkpoint-block errors.
    val bReady = new java.util.concurrent.CountDownLatch(1)
    val aDone = new java.util.concurrent.CountDownLatch(1)
    @volatile var bSum = -1L
    val bThread = new Thread(() =>
      Caches.scope(spark) {
        import spark.implicits._
        val mid = spark.range(0, 10000).map(_ + 1).toDF("v")
          .transform(Caches.scoped)
        mid.count() // materialize the persist
        val ck = mid.localCheckpoint(true)
        bReady.countDown()
        aDone.await()
        // reads AFTER a's scope closed must still be served
        bSum = ck.selectExpr("sum(v)").collect()(0).getLong(0)
      })
    bThread.start()
    bReady.await()
    Graft.runScoped("x46_part_pagerank", spark, sf)(_.count())
    aDone.countDown()
    bThread.join()
    assert(bSum == 10000L * 10001L / 2, s"B read wrong sum $bSum")
    val leaked = spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => !before.contains(id) }
    assert(leaked.isEmpty,
      s"last closer left ${leaked.size} RDDs: " +
        leaked.map { case (id, r) => s"$id:${r.name}" }.mkString(", "))
  }

  test("the deferred bank drains INCREMENTALLY: an orphan is swept once " +
      "the scopes open at its banking close, even while newer scopes " +
      "stay open (a server with continuously overlapping scopes stays " +
      "bounded)") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // A opens and leaves an untracked checkpoint backing (the orphan),
    // overlapping with B. A closes while B is open → the orphan banks
    // with guard {B}. C then opens (and stays open). Closing B must
    // sweep A's orphan even though C is still open — pre-fix, the bank
    // waited for a global quiet point that a busy server never reaches.
    val aOpen = new java.util.concurrent.CountDownLatch(1)
    val abDone = new java.util.concurrent.CountDownLatch(1)
    val cOpen = new java.util.concurrent.CountDownLatch(1)
    val bMayClose = new java.util.concurrent.CountDownLatch(1)
    val bClosed = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    @volatile var sweptWhileCOpen = false
    val aT = new Thread(() => Caches.scope(spark) {
      import spark.implicits._
      spark.range(0, 1000).map(_ + 1).toDF("v")
        .localCheckpoint(true).count() // untracked backing = the orphan
      aOpen.countDown()
      abDone.await() // hold A open until B is also open
    })
    val bT = new Thread(() => Caches.scope(spark) {
      aOpen.await()
      abDone.countDown() // A may close now; orphan banks with guard {B}
      bMayClose.await()
    })
    val cT = new Thread(() => Caches.scope(spark) {
      cOpen.countDown()
      release.await() // C stays open across B's close
    })
    aT.start(); bT.start()
    aT.join() // A closed; orphan banked (B still open)
    cT.start(); cOpen.await()
    bMayClose.countDown(); bT.join(); bClosed.countDown()
    // B closed, C still open: A's orphan must be gone already
    val leakedNow = spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => !before.contains(id) }
    sweptWhileCOpen = leakedNow.isEmpty
    release.countDown(); cT.join()
    assert(sweptWhileCOpen,
      "A's orphan survived B's close while C was open — the bank is " +
        "waiting for a global quiet point again")
  }

  test("an unscoped run still caches (ad-hoc use keeps its caches), " +
      "and clearCache remains the manual lever") {
    spark.catalog.clearCache()
    Graft.run("x06_dedup_minhash_lsh", spark, sf).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected the unscoped run to keep its caches")
    spark.catalog.clearCache()
  }
}
