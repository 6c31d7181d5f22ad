package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.hadoop.fs.Path

/** A `graftobj://` FileSystem that RECORDS every rename, mapping keys onto
  * a local root. Rename is the operation that makes FileOutputCommitter
  * expensive on object stores (a "rename" is a server-side copy + delete,
  * minio.rs has no rename at all) — recording them turns the v1-vs-v2
  * committer trade (S8SinkSpec, GraftSession.v2CommitFallbackConf) into a
  * counted observation instead of a documentation claim.
  *
  * (`final` deliberately: DocCountsSpec's suite census greps `^class`.)
  */
final class CountingObjStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftobj"
  override def getUri: java.net.URI = java.net.URI.create("graftobj:///")
  override def rename(src: Path, dst: Path): Boolean = {
    CountingObjStoreFs.renames.add((src.toUri.getPath, dst.toUri.getPath))
    super.rename(src, dst)
  }
}

object CountingObjStoreFs {
  val root: String =
    java.nio.file.Files.createTempDirectory("graftobj_store").toString
  val renames = new ConcurrentLinkedQueue[(String, String)]()
}

/** The committer contract, measured. Writing the same frame through the
  * v1 and v2 FileOutputCommitter algorithms against the recording
  * object-store FS shows the structural difference that matters at scale:
  * v1 promotes each task's DIRECTORY at task commit, then renames every
  * individual FILE at JOB commit — a serial, driver-side O(files) pass
  * that an object store executes as copies; v2 renames each file once,
  * straight to the destination, inside the task commit (parallel across
  * tasks, nothing left for job commit).
  */
class ObjStoreCommitSpec extends SparkSpecBase {

  private def writeAndCountRenames(algoVersion: Int, out: String): Seq[(String, String)] = {
    val sparkS = spark
    import sparkS.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.graftobj.impl", classOf[CountingObjStoreFs].getName)
    hconf.set("mapreduce.fileoutputcommitter.algorithm.version", algoVersion.toString)
    // fresh FS instance per algorithm so the impl conf re-resolves
    org.apache.hadoop.fs.FileSystem.closeAll()
    CountingObjStoreFs.renames.clear()
    (1 to 64).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
      .repartition(4)
      .write.mode("overwrite").parquet(s"graftobj://${CountingObjStoreFs.root}/$out")
    import scala.jdk.CollectionConverters._
    CountingObjStoreFs.renames.asScala.toSeq
  }

  private def dataRenames(renames: Seq[(String, String)]): Seq[(String, String)] =
    renames.filter(_._1.contains("part-")) // data files only, not _SUCCESS etc.

  test("v1 commit: task-dir promotion, then a per-file rename pass at job commit") {
    val all = writeAndCountRenames(1, "v1_out")
    val fileRenames = dataRenames(all)
    val files = fileRenames.map(_._1.split("/").last).distinct
    assert(files.size === 4) // repartition(4) -> one part file per task
    // the job-commit pass: each data FILE renamed out of the committed
    // task dir into the destination — serial and driver-side; on a real
    // object store each of these is a whole-object copy
    assert(fileRenames.size === files.size,
      s"expected 1 job-commit rename per data file, got:\n${fileRenames.mkString("\n")}")
    assert(fileRenames.forall(r => r._1.contains("_temporary") && !r._2.contains("_temporary")))
    // the task-commit pass renamed each task ATTEMPT DIRECTORY (not files)
    val dirRenames = all.filter(r => r._1.contains("attempt_") && !r._1.contains("part-"))
    assert(dirRenames.size === 4, s"expected 4 task-dir renames, got:\n${dirRenames.mkString("\n")}")
    // read-back still complete
    assert(spark.read.parquet(s"graftobj://${CountingObjStoreFs.root}/v1_out").count() === 64)
  }

  test("v2 commit renames every data file once, straight to the destination") {
    val renames = dataRenames(writeAndCountRenames(2, "v2_out"))
    val files = renames.map(_._1.split("/").last).distinct
    assert(files.nonEmpty)
    assert(renames.size === files.size,
      s"expected 1 rename per data file, got:\n${renames.mkString("\n")}")
    assert(renames.forall(!_._2.contains("_temporary")),
      "v2 must promote task output directly to the destination")
    assert(spark.read.parquet(s"graftobj://${CountingObjStoreFs.root}/v2_out").count() === 64)
  }
}
