package graft

import graft.llm.Dedup

/** Transitivity of the dedup clustering: chains must collapse to one
  * component even when endpoints share nothing directly (the case the
  * fixture's sparse candidate graph may not exercise). */
class ConnectedComponentsSpec extends SparkSpecBase {

  test("a chain 1-2-3-4 collapses to one component; isolated vertex keeps its own") {
    import spark.implicits._
    val vertices = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(vertices, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L))
  }

  test("reliable checkpointing yields the same components and writes round state to the dir") {
    import spark.implicits._
    val dir = "/root/repo/target/graft-tmp/cc_checkpoints"
    val vertices = (1L to 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(vertices, pairs, Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 6L, 7L -> 6L))
    // the rounds really went through reliable checkpoints on disk
    val written = new java.io.File(dir).listFiles()
    assert(written != null && written.nonEmpty, s"no checkpoint state under $dir")
  }

  test("two components + a bridge merge into one") {
    import spark.implicits._
    val vertices = (1L to 6L).toDF("doc_id")
    val base = Seq((1L, 2L), (4L, 5L), (5L, 6L))
    val gotBase = Dedup.connectedComponents(vertices, base.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotBase === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
    val bridged = base :+ (2L, 6L)
    val gotBridged = Dedup.connectedComponents(vertices, bridged.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotBridged === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
  }
}
