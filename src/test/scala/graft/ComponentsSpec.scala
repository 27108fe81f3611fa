package graft

import graft.operators.Components

/** [[Components.connectedComponents]] beyond its x14 instantiation: the
  * contracted-rounds + singleton-rejoin shape, early stop, and the
  * reliable-checkpoint knob for cluster runs (localCheckpoint blocks die
  * with an executor; `checkpointDir` trades a per-round write for
  * surviving that).
  */
class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  test("chains, separate components, and isolated vertices") {
    // 1-2-3-4-5 is a 4-hop chain (exercises pointer jumping),
    // 10-11 a second component, 7/8/9 isolated singletons
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L, 10L, 11L).toDF("id")
    val out = Components
      .connectedComponents(edges, "src", "dst", verts, "id", maxRounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      7L -> 7L, 8L -> 8L, 9L -> 9L, 10L -> 10L, 11L -> 10L))
  }

  test("reliable checkpoint path: same labels, rounds land in the dir") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val verts = (1L to 6L).toDF("id")
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val out = Components
      .connectedComponents(edges, "src", "dst", verts, "id",
        maxRounds = 12, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 5L, 6L -> 5L))
    // the rounds really checkpointed into the reliable store
    def countFiles(f: java.io.File): Int =
      if (f.isFile) 1 else Option(f.listFiles).fold(0)(_.map(countFiles).sum)
    assert(countFiles(new java.io.File(dir)) > 0,
      s"no reliable-checkpoint data under $dir")
  }

  test("edgeless graph: every vertex is its own component") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val verts = Seq(3L, 4L).toDF("id")
    val out = Components
      .connectedComponents(edges, "src", "dst", verts, "id", maxRounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(3L -> 3L, 4L -> 4L))
  }
}
