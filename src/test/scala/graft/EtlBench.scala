package graft


/** Round-over-round wall-time tracker for the serve-tier nightly
  * composite `Graft.runCorpusEtl` (spec-gated in RunEtlSpec, but specs
  * don't time): reports COLD (artifact roots cleared — the first
  * nightly on a new data version pays the chain builds) and WARM (the
  * steady-state nightly: artifact reuse, only the final joins) wall
  * seconds at the bench SF. The warm/cold split is the amortization
  * claim the serve tier makes, as a number instead of prose. Recorded
  * per round in `bench_builder_r{N}.json` as `run_corpus_etl_cold` /
  * `run_corpus_etl_warm` (builder record only — the driver registry
  * stays 251 rows).
  *
  * Min-of-N with the raw passes retained (the Bench pattern — r11
  * verdict #4): cold readings swung 30.2/34.9/42.7 across same-code
  * sessions, so the headline keys are MINS (the quiet-host floor, the
  * only number comparable round-over-round) and `cold_passes` /
  * `warm_passes` keep the raw sweep for variance reads.
  *
  * Usage: sbt "Test/runMain graft.EtlBench [sfDir] [passes]"
  */
object EtlBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = HarnessSession.build()
    val out = java.nio.file.Files
      .createTempDirectory("etlbench").toString
    def clearRoots(): Unit = Seq(
      operators.AuditServe.root(dir),
      operators.SimilarityQueries.serveRoot(dir),
      operators.GraphServe.root(dir)).foreach { r =>
      val d = new java.io.File(r)
      if (d.isDirectory)
        java.nio.file.Files.walk(d.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
    def timed(): Double = {
      val t0 = System.nanoTime()
      Caches.scope(spark)(Graft.runCorpusEtl(spark, dir, out).count())
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    // JIT warm-up on the smallest SF (plans + codegen), its roots cold
    Caches.scope(spark)(
      Graft.runCorpusEtl(spark, "/root/testdata/sf0.001", out).count())
    spark.catalog.clearCache()
    val colds = (1 to passes).map { _ => clearRoots(); timed() }
    val warms = (1 to passes).map(_ => timed())
    def arr(xs: Seq[Double]): String =
      xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    val record = f"""{"run_corpus_etl_cold":${colds.min}%.2f,""" +
      f""""run_corpus_etl_warm":${warms.min}%.2f,""" +
      s""""cold_passes":${arr(colds)},"warm_passes":${arr(warms)},""" +
      s""""sf":"$dir"}"""
    println(record)
    // file record, not stdout-only: the round-stamped
    // `bench_builder_r{N}.json` merges these keys so the amortization
    // trend stays machine-comparable round-over-round (the r10 verdict
    // found BASELINE.md claiming keys the JSON record didn't carry)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_ETL_OUT",
      "/root/repo/etl_bench.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      record.getBytes("UTF-8"))
    spark.stop()
  }
}
