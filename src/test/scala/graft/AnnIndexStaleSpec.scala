package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.llm.AnnIndex

/** Proves the ANN index staleness guard: an index built from one fixture
  * generation must NOT be served once the source file changes under the
  * same path — the exact hazard observed live when the driver regenerated
  * /root/testdata between rounds and `_SUCCESS`-only gating would have
  * silently served vectors that no longer exist.
  */
class AnnIndexStaleSpec extends SparkSpecBase {

  test("regenerating the embeddings source forces an index rebuild") {
    val tmpRoot = Files.createTempDirectory("graft-ann-stale").toString
    val srcDir = s"$tmpRoot/sfcopy"
    Files.createDirectories(Paths.get(srcDir))
    val src = Paths.get(s"$srcDir/embeddings.parquet")
    Files.copy(Paths.get(s"$sfDir/embeddings.parquet"), src,
      StandardCopyOption.REPLACE_EXISTING)

    val confKey = "spark.graft.ann.indexDir"
    val prior = spark.conf.getOption(confKey)
    spark.conf.set(confKey, s"$tmpRoot/index")
    try {
      // first ensure builds
      val codes = AnnIndex.ensureSq8(spark, srcDir)
      val success = new java.io.File(s"$codes/_SUCCESS")
      assert(success.exists(), "first ensure must build the index")
      val builtAt = success.lastModified

      // unchanged source: second ensure must be a no-op (same _SUCCESS)
      AnnIndex.ensureSq8(spark, srcDir)
      assert(success.lastModified == builtAt,
        "unchanged source must not trigger a rebuild")

      // simulate the driver's fixture regen: same path, new bytes/mtime
      assert(src.toFile.setLastModified(src.toFile.lastModified + 5000))
      val fpNow = AnnIndex.sourceFingerprint(srcDir)
      AnnIndex.ensureSq8(spark, srcDir)
      val stamped = new String(
        Files.readAllBytes(Paths.get(s"$codes/_GRAFT_SOURCE")),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(stamped == fpNow,
        "regenerated source must force a rebuild stamped with the new fingerprint")
      assert(success.lastModified != builtAt,
        "regenerated source must rewrite the index artifact")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }
}
