package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev-only, not part of the declared surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.install(spark)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    SparkEntry.queries("x70_prefix_jaccard")(spark, "/root/testdata/sf0.001")
      .count()
    spark.catalog.clearCache()

    // x70 stage split
    val t = Tables.documentsSpread(spark, sfDir)
      .withColumn("sh", expr("shingles3(text)"))
      .select(col("doc_id"), expr(
        """array_sort(transform(sh,
             x -> CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)))""")
        .as("hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("t_materialize")(println("t=" + t.count()))
    val pref = t.select(col("doc_id"),
      explode(expr("slice(hs, 1, size(hs) div 2 + 1)")).as("hv"),
      size(col("hs")).as("sz"))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.hv") === col("b.hv") &&
          col("a.doc_id") < col("b.doc_id") &&
          lit(2) * least(col("a.sz"), col("b.sz")) >=
            greatest(col("a.sz"), col("b.sz")))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("cand")(println("cand=" + cand.count()))
    val ver = cand
      .join(t.select(col("doc_id").as("da"), col("hs").as("hsa")), Seq("da"))
      .join(t.select(col("doc_id").as("db"), col("hs").as("hsb")), Seq("db"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        size(array_intersect(col("hsa"), col("hsb"))).cast("bigint")
          .as("inter"),
        size(col("hsa")).cast("bigint").as("sa"),
        size(col("hsb")).cast("bigint").as("sb"))
      .filter(col("inter") * 2 >= col("sa") + col("sb") - col("inter"))
    time("verify")(println("ver=" + ver.count()))
    time("x70_full_cold") {
      spark.catalog.clearCache()
      SparkEntry.queries("x70_prefix_jaccard")(spark, sfDir).count()
    }
    spark.stop()
  }
}
