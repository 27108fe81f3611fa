package graft

import org.apache.spark.sql.SparkSession

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
  * Usage: sbt "Test/runMain graft.ScaleExp [/tmp/scaledata] [passes] [1,4,10]"
  */
object ScaleExp {

  val Heavy: Seq[String] = Seq(
    "x85_ivfpq_search", "x86_cluster_silhouette", "x96_hard_negatives",
    "x46_part_pagerank", "x61_label_communities", "x99_ivf_coarse_route",
    "x14_dedup_clusters", "x42_cluster_canonical",
    "x73_source_attribution", "x65_bm25_rank", "x41_embed_dedup_clusters",
    "x87_csls_rescore", "x88_ivf_append", "x71_triangle_cc",
    "corpus_curate")

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
    val mults = args.lift(2).getOrElse("1,4,10")
      .split(",").map(_.trim.toInt).toSeq
    require(mults.length == 3, "need exactly 3 multipliers for beta")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = mults.map(m => m -> s"$base/x$m")
    dirs.foreach { case (m, dir) => ScaleGen.write(spark, dir, m) }
    // warm-up at the smallest size: plans, codegen, JIT
    Heavy.foreach { q =>
      Caches.scope(spark)(SparkEntry.queries(q)(spark, dirs.head._2).count())
      spark.catalog.clearCache()
    }
    val times = scala.collection.mutable.Map
      .empty[(String, Int), List[Double]].withDefaultValue(Nil)
    for (p <- 1 to passes; (m, dir) <- dirs; q <- Heavy) {
      val t0 = System.nanoTime()
      Caches.scope(spark)(SparkEntry.queries(q)(spark, dir).count())
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      times((q, m)) = dt :: times((q, m))
      println(f"[scaleexp] pass $p x$m%-2d $q%-28s $dt%7.2f s")
    }
    val rows = Heavy.map { q =>
      val ts = mults.map(m => times((q, m)).min)
      val alpha10 = math.log10(ts.last / ts.head) /
        math.log10(mults.last.toDouble / mults.head)
      val beta = marginalBeta(mults.map(_.toDouble), ts)
      (q, ts, alpha10, beta)
    }
    println("[scaleexp] query," +
      mults.map(m => s"t${m}_min_s").mkString(",") + ",alpha10,beta")
    rows.foreach { case (q, ts, a, b) =>
      println(f"[scaleexp] $q%-28s " +
        ts.map(t => f"$t%8.2f").mkString(" ") + f"  $a%5.2f  $b%5.2f")
    }
    val json = rows.map { case (q, ts, a, b) =>
      val tf = mults.zip(ts)
        .map { case (m, t) => f"""\"t$m\":$t%.3f""" }.mkString(",")
      f"""\"$q\":{$tf,\"alpha10\":$a%.3f,\"beta\":$b%.3f}"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/scale_exp.json"), json)
    spark.stop()
    println(s"[scaleexp] wrote /root/repo/scale_exp.json")
  }
}
