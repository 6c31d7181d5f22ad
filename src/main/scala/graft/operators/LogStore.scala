package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** The table log's one atomic step, extracted behind a seam (the r13
  * verdict's top item): [[TableLog.publish]] stages a manifest to a
  * dot-tmp and then needs exactly ONE primitive from storage — publish
  * `tmp` as `dst` such that of N concurrent publishers of the same `dst`
  * exactly one wins, every loser observes a loud failure, and no reader
  * ever sees a torn `dst`. Which syscall delivers that contract is a
  * property of the STORAGE, not of the log protocol, so it is a trait
  * with one impl per storage class — the LogStore seam of the production
  * lakehouse formats:
  *
  *  - HDFS: `FileContext.rename(Options.Rename.NONE)` — the namenode
  *    checks-and-renames inside one RPC ([[RenameLogStore]]);
  *  - POSIX local FS: `link(2)` via `Files.createLink` — the kernel
  *    creates the destination name atomically (EEXIST for losers) and
  *    the new name carries the tmp's COMPLETE inode, so there is no
  *    torn-read window and no crash state that wedges the table: either
  *    `dst` exists fully-written or nothing happened
  *    ([[HardLinkLogStore]]). This CLOSES the two-writer window the
  *    rename route only narrows on POSIX (rename(2) clobbers; the
  *    no-clobber check in the FS layer is check-then-act);
  *  - S3-class object stores: a conditional PUT (`If-None-Match: *`) is
  *    the same primitive; no impl ships here because no object-store
  *    client jar does (sandbox has no hadoop-aws), but the seam is
  *    exactly where it plugs in — reference semantics:
  *    src/storage/minio.rs:139-242's store is such an object store.
  *
  * On lost race every impl throws Hadoop's
  * [[org.apache.hadoop.fs.FileAlreadyExistsException]]; [[TableLog]]
  * wraps it into the "lost the publish race" IllegalStateException its
  * optimistic-retry loop keys on.
  */
private[graft] sealed trait LogStore {
  /** Publish the fully-staged `tmp` as `dst` with one-winner semantics.
    * Both paths are absolute and qualified; `tmp` is consumed on
    * success. Throws FileAlreadyExistsException when another publisher
    * already owns `dst`. */
  def publishExclusive(conf: Configuration, tmp: Path, dst: Path): Unit
}

private[graft] object LogStore {

  /** Pick the impl for this table's storage. `spark.graft.logstore`
    * overrides: `hardlink` / `rename` force an impl (the race spec pins
    * both); default `auto` = hardlink on `file:` (the closed-window
    * primitive for the scheme), rename elsewhere (atomic-exclusive on
    * HDFS, the storage the rename contract names). */
  def forTable(spark: SparkSession, table: Path): LogStore = {
    val conf = spark.sparkContext.hadoopConfiguration
    val scheme = Option(table.toUri.getScheme).getOrElse(
      org.apache.hadoop.fs.FileSystem.getDefaultUri(conf).getScheme)
    spark.conf.get("spark.graft.logstore", "auto") match {
      case "hardlink" => HardLinkLogStore
      case "rename" => RenameLogStore
      case "auto" => if (scheme == "file") HardLinkLogStore else RenameLogStore
      case other => throw new IllegalArgumentException(
        s"spark.graft.logstore: unknown impl '$other' (auto|hardlink|rename)")
    }
  }
}

/** HDFS impl: no-clobber rename. The namenode rejects an existing
  * destination inside the one rename op (the HDFSLogStore discipline of
  * the production log stores), so a lost race surfaces as
  * FileAlreadyExistsException, never as a silently overwritten manifest.
  * On a local POSIX FS the same call only NARROWS the two-writer window
  * (the no-clobber check is check-then-act above rename(2), which
  * clobbers) — local tables get [[HardLinkLogStore]] instead. */
private[graft] object RenameLogStore extends LogStore {
  def publishExclusive(conf: Configuration, tmp: Path, dst: Path): Unit = {
    val fc = FileContext.getFileContext(dst.toUri, conf)
    try fc.rename(tmp, dst, Options.Rename.NONE)
    catch {
      case e: java.io.IOException
          if !e.isInstanceOf[FileAlreadyExistsException] &&
            e.getMessage != null && e.getMessage.contains("already exists") =>
        // RawLocalFs surfaces the no-clobber refusal as a plain
        // IOException rather than the typed FileAlreadyExistsException
        throw new FileAlreadyExistsException(e.getMessage)
    }
  }
}

/** POSIX impl: hard-link the staged manifest to its final name.
  * `link(2)` is the textbook one-winner primitive — atomic name
  * creation, EEXIST for every loser, and the published name shares the
  * tmp's inode so it appears WITH its full content (a reader can never
  * open a half-written manifest, unlike create-then-write claims). Crash
  * at any point leaves either a published `dst` or only an ignorable
  * dot-tmp — no lock to leak, no wedged version, no repair path needed.
  * The tmp (and the checksummed LocalFileSystem's `.crc` sibling from
  * staging) is unlinked after publish; a crash between link and unlink
  * leaves only those same ignorable dot-files. */
private[graft] object HardLinkLogStore extends LogStore {
  def publishExclusive(conf: Configuration, tmp: Path, dst: Path): Unit = {
    val t = java.nio.file.Paths.get(tmp.toUri.getPath)
    val d = java.nio.file.Paths.get(dst.toUri.getPath)
    try java.nio.file.Files.createLink(d, t)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new FileAlreadyExistsException(s"$dst already exists: $e")
    }
    java.nio.file.Files.deleteIfExists(t)
    java.nio.file.Files.deleteIfExists(
      t.resolveSibling("." + t.getFileName.toString + ".crc"))
  }
}
