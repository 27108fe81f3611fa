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
    // warm the JVM/codegen on the tiny SF
    SparkEntry.queries("x46_part_pagerank")(spark, "/root/testdata/sf0.001")
      .count()
    spark.catalog.clearCache()

    // x46 stage split at sfDir
    val sets = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(collect_set(col("pk")).as("pks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sets")(println("sets=" + sets.count()))
    val wout = sets
      .select(explode(col("pks")).as("src"),
        (size(col("pks")) - 1).cast("bigint").as("k"))
      .groupBy("src").agg(sum(col("k")).as("wout"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("wout+scal") {
      println(wout.agg(count(lit(1)), count(when(col("wout") > 0, 1)))
        .head())
    }
    val pairs = sets
      .select(explode(col("pks")).as("src"), col("pks"))
      .select(col("src"), explode(col("pks")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val ew = pairs.join(broadcast(wout), Seq("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("ew")(println("ew=" + ew.count()))
    val nodes = wout.filter(col("wout") > 0)
      .select(col("src").as("node"))
    val nodesC = time("nodes_ckpt")(nodes.localCheckpoint(true))
    val n = nodesC.count()
    val base = s"(CAST(1000000000000 AS BIGINT) div ${n}L)"
    var rank = nodesC.select(col("node"), expr(base).as("rank"))
    for (r <- 1 to 3) {
      val rsrc = rank.withColumnRenamed("node", "src")
      val next = ew.join(broadcast(rsrc), Seq("src"))
        .select(col("dst").as("node"),
          expr("(rank * w) div wout").as("c"))
        .groupBy("node").agg(sum(col("c")).as("contrib"))
        .select(col("node"),
          expr(s"($base * 15) div 100 + (85 * contrib) div 100")
            .as("rank"))
      rank = time(s"round$r")(
        if (r < 3) next.localCheckpoint(true)
        else { next.persist(); next.count(); next })
    }
    time("final")(
      rank.orderBy(col("rank").desc, col("node")).limit(100).count())
    spark.catalog.clearCache()
    time("x46_full_cold") {
      SparkEntry.queries("x46_part_pagerank")(spark, sfDir).count()
    }
    spark.stop()
  }
}
