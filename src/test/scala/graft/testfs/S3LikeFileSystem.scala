package graft.testfs

import java.io.FileNotFoundException
import java.net.URI
import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** Process-wide operation log for [[S3LikeFileSystem]] — specs assert
  * on it (how many objects a "rename" copied, which prefixes were
  * listed, what got deleted). Thread-safe: local-mode executors share
  * the JVM. */
object S3OpLog {
  final case class Op(name: String, src: String, dst: String)
  private val log = new java.util.concurrent.ConcurrentLinkedQueue[Op]()
  def record(name: String, src: String, dst: String = ""): Unit =
    log.add(Op(name, src, dst))
  def ops: Seq[Op]                = { import scala.jdk.CollectionConverters._; log.asScala.toSeq }
  def count(name: String): Int    = ops.count(_.name == name)
  def clear(): Unit               = log.clear()
}

/** An OBJECT-STORE-semantics Hadoop `FileSystem` for contract tests —
  * the reference's storage layer is S3 end-to-end
  * (`etl/lightweight_etl.py:146-187`, `api/api_handler.py:451-477`),
  * and the library's write/replay contracts (dynamic partition
  * overwrite, upsert commit, `modifiedAfter` listing) must hold under
  * S3 behavior, not just the local FS they were developed on.
  *
  * Registered as scheme `s3x` (`fs.s3x.impl`), backed by the local
  * disk (path part of the URI maps to a local path), but surfacing the
  * object-store behaviors that differ from HDFS/local:
  *
  *  - NO atomic rename: rename is emulated as per-object COPY then
  *    DELETE (one `copyObject` log entry per object — exactly S3A's
  *    cost model), with the standard FileSystem dest-exists semantics;
  *  - NO append: S3 objects are immutable — `append` throws, so any
  *    contract silently relying on append fails loudly here;
  *  - every rename/copy/delete/list is recorded in [[S3OpLog]] so a
  *    spec can assert the exact commit traffic (e.g. "the upsert
  *    rewrote only the touched partition's objects").
  */
class S3LikeFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3x"
  override def getUri: URI       = URI.create("s3x:///")

  override def rename(src: Path, dst: Path): Boolean = {
    S3OpLog.record("rename", src.toString, dst.toString)
    val srcSt =
      try getFileStatus(src)
      catch { case _: FileNotFoundException => return false }
    // FileSystem rename contract: renaming into an existing directory
    // places src UNDER it (S3A resolves the same way on prefixes)
    val target =
      if (exists(dst) && getFileStatus(dst).isDirectory) new Path(dst, src.getName)
      else dst
    if (exists(target) && getFileStatus(target).isFile) return false
    if (srcSt.isFile) copyObject(src, target)
    else {
      val files = listAllFiles(src)
      files.foreach { f =>
        val rel = f.toUri.getPath.stripPrefix(src.toUri.getPath).stripPrefix("/")
        copyObject(f, new Path(target, rel))
      }
      if (files.isEmpty) super.mkdirs(target) // empty "directory marker"
    }
    super.delete(src, true)
  }

  /** One S3 COPY: bytes move, non-atomically, object by object. */
  private def copyObject(src: Path, dst: Path): Unit = {
    S3OpLog.record("copyObject", src.toString, dst.toString)
    super.mkdirs(dst.getParent)
    FileUtil.copy(this, src, this, dst, false, true, getConf)
    ()
  }

  private def listAllFiles(dir: Path): Seq[Path] = {
    val st = super.listStatus(dir)
    st.toSeq.flatMap { s =>
      if (s.isDirectory) listAllFiles(s.getPath) else Seq(s.getPath)
    }
  }

  override def append(
      f: Path,
      bufferSize: Int,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream =
    throw new UnsupportedOperationException(
      "append is not supported by S3-like object stores")

  override def delete(p: Path, recursive: Boolean): Boolean = {
    S3OpLog.record("delete", p.toString)
    super.delete(p, recursive)
  }

  // RawLocalFileSystem returns lazy statuses whose permission loader
  // does `new File(uri)` and rejects the s3x scheme — materialize
  // plain statuses instead (object stores report synthetic perms
  // anyway, exactly like S3A's default FsPermission)
  private def materialize(s: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(
      s.getLen, s.isDirectory, 1, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getFileDefault,
      "", "", s.getPath)

  override def getFileStatus(p: Path): org.apache.hadoop.fs.FileStatus =
    materialize(super.getFileStatus(p))

  override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    S3OpLog.record("listStatus", p.toString)
    super.listStatus(p).map(materialize)
  }

  override def create(
      f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    S3OpLog.record("create", f.toString)
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
}
