package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** s10's claim SQL can't see: the fragmented layout really is fragmented
  * (many files per partition dir — the appender anti-pattern), the
  * compacted layout really is compacted (file count ≈ dir count), and
  * the rewrite is the identity on the data. */
class CompactionSpec extends SparkSpecBase {

  private def parquetFilesPerDir(root: String): Map[String, Int] =
    Files.list(Paths.get(root)).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
      .map { d =>
        d.getFileName.toString ->
          Files.list(d).iterator().asScala
            .count(_.getFileName.toString.endsWith(".parquet"))
      }.toMap

  test("s10: fragmented -> compacted collapses files per dir; data is identity") {
    val sparkS = spark
    import sparkS.implicits._
    val result = graft.operators.Etl.s10Compaction(spark, sfDir)
    val scratch = spark.conf.get("spark.graft.scratchDir", "/root/repo/target/graft-tmp")
    val before = parquetFilesPerDir(s"$scratch/s10_fragmented")
    val after = parquetFilesPerDir(s"$scratch/s10_compacted")
    assert(before.nonEmpty && before.keySet === after.keySet)
    // every partition dir collapses to a handful of files (1 per holding
    // task); the fragmented side carries the 32-writer fan-out
    before.foreach { case (dir, n) =>
      assert(n >= 8, s"fragmented $dir not fragmented: $n files")
      assert(after(dir) <= 2, s"compacted $dir still fragmented: ${after(dir)} files")
    }
    // identity on the data: read-back counts equal the source counts
    val source = Tables.events(spark, sfDir)
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = result.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === source)
  }
}
