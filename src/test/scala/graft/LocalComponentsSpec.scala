package graft

import org.apache.spark.sql.functions._

/** The bucket-local union-find expression behind x41/x64's hierarchical
  * connected components (graft.functions.LocalComponents).
  */
class LocalComponentsSpec extends SparkSpec {

  test("local_components labels per-bucket unions with min reachable id") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val pairs = Seq((1L, 10L, 20L), (1L, 20L, 30L), (2L, 5L, 6L),
      (2L, 7L, 8L))
      .toDF("bucket", "a", "b")
    val comp = pairs.groupBy("bucket")
      .agg(collect_list(struct(col("a"), col("b"))).as("es"))
      .select(explode(expr("local_components(es)")).as("ic"))
      .select(col("ic.id"), col("ic.comp"))
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L))
  }

  test("local_components matches the BSP Components loop on a random graph") {
    GraftExtensions.install(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map { _ =>
      (rnd.nextInt(10).toLong, // bucket
        rnd.nextInt(40).toLong * 10 + rnd.nextInt(10),
        rnd.nextInt(40).toLong * 10 + rnd.nextInt(10))
    }.toDF("bucket", "a", "b")
    // bucket-local ground truth via the global BSP loop on the SAME
    // edges, bucket keys folded into the vertex ids so buckets stay
    // independent components there too
    val keyed = edges.select(
      (col("bucket") * 100000 + col("a")).as("ka"),
      (col("bucket") * 100000 + col("b")).as("kb"))
    val verts = keyed.select(col("ka").as("v"))
      .unionByName(keyed.select(col("kb").as("v"))).distinct()
    val expect = operators.Components
      .connectedComponents(keyed, "ka", "kb", verts, "v", 20)
      .select(col("v"), col("component"))
      .as[(Long, Long)].collect().toMap
    val got = edges.groupBy("bucket")
      .agg(collect_list(struct(col("a"), col("b"))).as("es"))
      .select(col("bucket"), explode(expr("local_components(es)")).as("ic"))
      .select((col("bucket") * 100000 + col("ic.id")).as("v"),
        (col("bucket") * 100000 + col("ic.comp")).as("component"))
      .as[(Long, Long)].collect().toMap
    assert(got == expect)
  }
}
