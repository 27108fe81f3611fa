package graft


/** Scaling-exponent measurement for the heaviest registry rows
  * (SCALE.md's measured-exponents table): generates the [[ScaleGen]]
  * dataset at several multipliers of the sf0.1 shape (default 1×, 4×,
  * 10×), times each row at every size with the house bench discipline
  * (warm-up pass, ALTERNATING size order so a host transient cannot
  * poison one scale, MIN across passes as the quiet-host floor), and
  * reports two things per row:
  *
  *   - `alpha10` = log10(t10 / t1) — the naive end-to-end exponent
  *     (biased DOWN by fixed costs, which dominate at these sizes);
  *   - `beta` — the marginal exponent of the VARIABLE term, recovered
  *     from three points under t(n) = c + k·n^beta by solving
  *     (t3 − t2)/(t2 − t1) = (m3^b − m2^b)/(m2^b − m1^b) for b
  *     (bisection; the fixed cost c cancels in the differences). For
  *     multipliers 1/4/10 the slope ratio reads 2.0 at beta = 1
  *     (linear), 5.6 at beta = 2 (quadratic) — THIS is the number that
  *     says whether a row survives 100×, because at scale the variable
  *     term is all that's left.
  *
  * With FOUR OR MORE multipliers the per-row record adds the
  * least-squares (β, k, rmse) under t = c + k·m^β plus the jackknife
  * β range across leave-out triples — the confidence statement the
  * 3-point differencing can't make (zero residual dof).
  *
  * Usage: SPARK_DRIVER_MEM=24g sbt "Test/runMain graft.ScaleExp
  *   [/tmp/scaledata] [passes] [1,4,10[,20]] [rowsCsv] [outPath]"
  *
  * 24g is the measured-clean config (SCALE.md round 11,
  * `scale_exp_refit_24g.json`): at the default 8 GiB the in-suite 20×
  * cells of the heavy rows measure old-gen pressure from neighboring
  * rows' states, not the algorithm — x46's fit moved 1.37 → 1.03 on a
  * 3× heap at constant code. A 20×-capable run on a smaller heap logs
  * a warning and proceeds (see also [[IsoProbe]], the per-row isolated
  * doubling recorder).
  */
object ScaleExp {

  val Heavy: Seq[String] = Seq(
    "x85_ivfpq_search", "x86_cluster_silhouette", "x96_hard_negatives",
    "x46_part_pagerank", "x61_label_communities", "x99_ivf_coarse_route",
    "x14_dedup_clusters", "x42_cluster_canonical",
    "x73_source_attribution", "x65_bm25_rank", "x41_embed_dedup_clusters",
    "x87_csls_rescore", "x88_ivf_append", "x71_triangle_cc",
    "corpus_curate")

  /** Fit t(m) = c + k·m^β over N ≥ 3 points by grid-refined least
    * squares: for a fixed β the (c, k) minimizers are the ordinary
    * 2-variable normal equations over x = m^β, so the scan is linear
    * in the grid. Returns (β, k, rmse); β = NaN when the best fit
    * wants k ≤ 0 (times don't grow — variable term below noise).
    * With 4+ points the fit has residual degrees of freedom, which is
    * what separates a real super-linear term from one noisy cell —
    * the r10 records flipped x96/x41/x71/x46 between records because
    * 3 points + differencing have zero dof.
    */
  def fitBeta(m: Seq[Double], t: Seq[Double]): (Double, Double, Double) = {
    require(m.length >= 3 && m.length == t.length)
    def solve(b: Double): (Double, Double, Double) = { // (sse, c, k)
      val x = m.map(math.pow(_, b))
      val n = x.length.toDouble
      val sx = x.sum; val sxx = x.map(v => v * v).sum
      val st = t.sum
      val sxt = x.zip(t).map { case (a, c) => a * c }.sum
      val det = n * sxx - sx * sx
      if (math.abs(det) < 1e-12) return (Double.MaxValue, 0, 0)
      val k = (n * sxt - sx * st) / det
      val c = (st - k * sx) / n
      val sse = t.zip(x).map { case (tv, xv) =>
        val e = tv - (c + k * xv); e * e }.sum
      (sse, c, k)
    }
    var best = (Double.MaxValue, 0.0, 0.0, 0.0) // (sse, beta, c, k)
    var b = 0.05
    while (b <= 4.0 + 1e-9) {
      val (sse, c, k) = solve(b)
      if (sse < best._1) best = (sse, b, c, k)
      b += 0.005
    }
    val rmse = math.sqrt(best._1 / m.length)
    if (best._4 <= 0) (Double.NaN, best._4, rmse)
    else (best._2, best._4, rmse)
  }

  /** Jackknife spread for 4+ sizes: the 3-point [[marginalBeta]] on
    * every leave-rest-out triple. Agreement across triples is the
    * confidence statement; a triple at the noise floor contributes
    * NaN and is dropped.
    */
  def betaSpread(m: Seq[Double], t: Seq[Double]): Seq[Double] =
    m.indices.combinations(3).map { idx =>
      marginalBeta(idx.map(m), idx.map(t))
    }.filter(b => !b.isNaN).toSeq

  /** Solve (t3-t2)/(t2-t1) = (m3^b - m2^b)/(m2^b - m1^b) for b by
    * bisection on [0.05, 4]; NaN when the differences are non-positive
    * (noise floor — variable term too small to measure).
    */
  def marginalBeta(m: Seq[Double], t: Seq[Double]): Double = {
    require(m.length == 3 && t.length == 3)
    val want = (t(2) - t(1)) / (t(1) - t(0))
    if (!want.isFinite || t(1) - t(0) <= 0 || t(2) - t(1) <= 0)
      return Double.NaN
    def ratio(b: Double) =
      (math.pow(m(2), b) - math.pow(m(1), b)) /
        (math.pow(m(1), b) - math.pow(m(0), b))
    var lo = 0.05
    var hi = 4.0
    if (want <= ratio(lo)) return lo
    if (want >= ratio(hi)) return hi
    var i = 0
    while (i < 60) {
      val mid = (lo + hi) / 2
      if (ratio(mid) < want) lo = mid else hi = mid
      i += 1
    }
    (lo + hi) / 2
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/scaledata")
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    // sorted: marginalBeta / betaSpread difference index-ordered
    // triples, which assume ascending sizes (fitBeta is
    // order-insensitive, but the jackknife is not)
    val mults = args.lift(2).getOrElse("1,4,10")
      .split(",").map(_.trim.toInt).toSeq.sorted
    require(mults.length >= 3, "need at least 3 multipliers for beta")
    // subset + output-path args so the noisy rows can be re-fit at a
    // 4th size with extra passes without re-measuring all 15 rows or
    // clobbering the full-table record
    val rows0 = args.lift(3)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Heavy)
    val outPath = args.lift(4).getOrElse("/root/repo/scale_exp.json")
    if (mults.max >= 20 && HarnessSession.smallHeap)
      println("[scaleexp] WARNING: 20x+ cells on a heap < 20 GiB measure " +
        "the suite's old-gen pressure, not the algorithm (SCALE.md r11) " +
        "— launch with SPARK_DRIVER_MEM=24g")
    val spark = HarnessSession.build()
    val dirs = mults.map(m => m -> s"$base/x$m")
    dirs.foreach { case (m, dir) => ScaleGen.write(spark, dir, m) }
    // warm-up at the smallest size: plans, codegen, JIT
    val warmDir = dirs.minBy(_._1)._2
    rows0.foreach { q =>
      Caches.scope(spark)(SparkEntry.queries(q)(spark, warmDir).count())
      spark.catalog.clearCache()
    }
    val times = scala.collection.mutable.Map
      .empty[(String, Int), List[Double]].withDefaultValue(Nil)
    for (p <- 1 to passes; (m, dir) <- dirs; q <- rows0) {
      val t0 = System.nanoTime()
      Caches.scope(spark)(SparkEntry.queries(q)(spark, dir).count())
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      times((q, m)) = dt :: times((q, m))
      println(f"[scaleexp] pass $p x$m%-2d $q%-28s $dt%7.2f s")
    }
    val md = mults.map(_.toDouble)
    val rows = rows0.map { q =>
      val ts = mults.map(m => times((q, m)).min)
      val alpha10 = math.log10(ts.last / ts.head) /
        math.log10(mults.last.toDouble / mults.head)
      val (bFit, k, rmse) = fitBeta(md, ts)
      // 3 sizes: the original differencing beta; 4+: the LSQ fit plus
      // the jackknife min..max across leave-out triples
      val beta = if (mults.length == 3) marginalBeta(md, ts) else bFit
      val spread = if (mults.length > 3) betaSpread(md, ts) else Nil
      (q, ts, alpha10, beta, k, rmse, spread)
    }
    println("[scaleexp] query," +
      mults.map(m => s"t${m}_min_s").mkString(",") +
      ",alpha10,beta[,k,rmse,jack_lo..hi]")
    rows.foreach { case (q, ts, a, b, k, r, sp) =>
      // gated on RUN MODE (4+ sizes), not on the jackknife spread being
      // non-empty: a 4-point run where every leave-out triple hits the
      // noise floor still produced a fit (k, rmse) worth reporting
      val tail =
        if (mults.length <= 3) ""
        else if (sp.isEmpty) f"  k=$k%7.4f rmse=$r%5.2f jack=[noise floor]"
        else f"  k=$k%7.4f rmse=$r%5.2f jack=[${sp.min}%4.2f..${sp.max}%4.2f]"
      println(f"[scaleexp] $q%-28s " +
        ts.map(t => f"$t%8.2f").mkString(" ") + f"  $a%5.2f  $b%5.2f$tail")
    }
    // NaN (the noise-floor contract of both beta estimators) is not
    // valid JSON — render it as null so the record stays machine-
    // readable for the round-over-round comparison it exists for
    def num(v: Double): String = if (v.isNaN) "null" else f"$v%.3f"
    val json = rows.map { case (q, ts, a, b, k, r, sp) =>
      val tf = mults.zip(ts)
        .map { case (m, t) => f"""\"t$m\":$t%.3f""" }.mkString(",")
      // 4+-size runs always carry the fit fields; an all-NaN jackknife
      // (every leave-out triple at the noise floor) renders as null
      // bounds instead of silently dropping k/rmse — '3-point mode' and
      // '4-point noise floor' must stay distinguishable in the record
      val extra = if (mults.length <= 3) "" else
        f""",\"k\":$k%.4f,\"rmse\":$r%.3f""" +
          s""","beta_jack_lo":${if (sp.isEmpty) "null" else num(sp.min)}""" +
          s""","beta_jack_hi":${if (sp.isEmpty) "null" else num(sp.max)}"""
      s""""$q":{$tf,"alpha10":${num(a)},"beta":${num(b)}$extra}"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), json)
    spark.stop()
    println(s"[scaleexp] wrote $outPath")
  }
}
