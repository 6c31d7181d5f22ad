package graft

import graft.llm.Multimodal

/** The decode is a stub; the distributed plumbing around it is real and
  * tested here: schema contract, batch shape, determinism, binary column
  * round-trip. */
class MultimodalSpec extends SparkSpecBase {

  test("media table carries binary payloads with typed metadata") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, sfDir)
    val row = media.head()
    assert(row.payload.nonEmpty && row.byte_len === row.payload.length)
    assert(row.media_type.startsWith("image/px"))
    assert(media.count() === Tables.documents(spark, sfDir).count())
  }

  test("feature extraction is partition-batched, fixed-dim, deterministic") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sfDir))
    val rows = feats.collect()
    assert(rows.forall(_.features.length === 8))
    assert(rows.forall(f => f.features.forall(v => v >= 0f && v <= 1f)))
    assert(rows.forall(f => f.width >= 16 && f.height >= 16))
    val again = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sfDir)).collect()
    val m1 = rows.map(f => f.doc_id -> f.features.toSeq).toMap
    val m2 = again.map(f => f.doc_id -> f.features.toSeq).toMap
    assert(m1 === m2)
  }

  test("binaryFile source reads opaque payloads with typed metadata (L5 ingest path)") {
    import spark.implicits._
    val dir = new java.io.File("/root/repo/target/graft-tmp/binmedia")
    dir.mkdirs()
    val payloads = Map("a.px" -> "alpha-bytes", "b.px" -> "beta", "c.px" -> "gamma-payload")
    payloads.foreach { case (name, content) =>
      java.nio.file.Files.write(new java.io.File(dir, name).toPath, content.getBytes("UTF-8"))
    }
    val df = spark.read.format("binaryFile").option("pathGlobFilter", "*.px")
      .load(dir.getAbsolutePath)
    assert(df.columns.toSet === Set("path", "modificationTime", "length", "content"))
    val got = df.collect().map { r =>
      val name = r.getAs[String]("path").split("/").last
      name -> (new String(r.getAs[Array[Byte]]("content"), "UTF-8"), r.getAs[Long]("length"))
    }.toMap
    assert(got.keySet === payloads.keySet)
    payloads.foreach { case (k, v) =>
      assert(got(k)._1 === v && got(k)._2 === v.length.toLong)
    }
  }

  test("repartitioning does not change extracted features (no cross-row state)") {
    val base = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sfDir))
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val repart = Multimodal.extractFeatures(
      Multimodal.mediaTable(spark, sfDir).repartition(7))
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(base === repart)
  }
}
