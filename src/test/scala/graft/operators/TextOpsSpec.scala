package graft.operators

import graft.SparkSuite

class TextOpsSpec extends SparkSuite {

  test("dedupClusters: components converge to the min reachable id") {
    val s = spark
    import s.implicits._
    // component {1,2,3,4,5,6} as a CHAIN (diameter 5 — forces several
    // propagation supersteps), component {10,11}, component {20,21,22}
    // as a star on 21
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L), (5L, 6L),
      (11L, 10L),
      (21L, 20L), (21L, 22L))
      .toDF("id_a", "id_b")
    val got = TextOps.dedupClusters(pairs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("dedupClusters: empty pair set yields empty labels") {
    val s = spark
    import s.implicits._
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(TextOps.dedupClusters(none).count() == 0)
  }

  test("dedupClusters: reliable checkpointing matches localCheckpoint") {
    val s = spark
    import s.implicits._
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L), (5L, 6L),
      (11L, 10L))
      .toDF("id_a", "id_b")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    val reliable = TextOps.dedupClusters(pairs,
        checkpointDir = Some(dir))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val local = TextOps.dedupClusters(pairs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(reliable == local)
    // reliable mode actually wrote superstep snapshots to the dir
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .count() > 0)
  }
}
