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
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val warm = "/root/testdata/sf0.001"
    for (q <- Seq("x46_part_pagerank", "x61_label_communities"))
      SparkEntry.queries(q)(spark, warm).count()
    spark.catalog.clearCache()

    // x46 stage breakdown on the new shape
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    time("read_lineitem")(println("li=" + li.count()))
    val sets = li.groupBy("ok").agg(collect_set(col("pk")).as("pks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sets")(println("sets=" + sets.count()))
    val pairs = sets
      .select(explode(col("pks")).as("src"), col("pks"))
      .select(col("src"), explode(col("pks")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val wout = sets
      .select(explode(col("pks")).as("src"),
        (size(col("pks")) - 1).cast("bigint").as("k"))
      .groupBy("src").agg(sum(col("k")).as("wout"))
    val ew = pairs.join(broadcast(wout), Seq("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("ew")(println("ew=" + ew.count()))
    time("rounds_bcast") {
      val nodes = ew.select(col("src").as("node")).distinct()
      val base = "(CAST(1000000000000 AS BIGINT) div n)"
      var rank = nodes
        .crossJoin(broadcast(nodes.agg(count(lit(1)).as("n"))))
        .select(col("node"), expr(base).as("rank"), col("n"))
      for (i <- 1 to 3) {
        rank = ew
          .join(broadcast(rank.withColumnRenamed("node", "src")), Seq("src"))
          .select(col("dst").as("node"),
            expr("(rank * w) div wout").as("c"), col("n"))
          .groupBy("node", "n").agg(sum(col("c")).as("contrib"))
          .select(col("node"),
            expr(s"($base * 15) div 100 + (85 * contrib) div 100")
              .as("rank"),
            col("n"))
        val r2 = rank
        time(s"round_$i")(println("cnt=" + r2.count()))
      }
      println("top=" + rank.orderBy(col("rank").desc).limit(100).count())
    }
    spark.catalog.clearCache()
    time("x46_full") {
      SparkEntry.queries("x46_part_pagerank")(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    time("x61_full") {
      SparkEntry.queries("x61_label_communities")(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    time("x61_again") {
      SparkEntry.queries("x61_label_communities")(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
