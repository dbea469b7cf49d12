package graft.sink

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test filesystem modeling the WORST-case object store for commit
  * arbitration: `create(overwrite = false)` is a blind PUT — no
  * existence check at all, last writer silently wins (a bare S3 PUT
  * without `If-None-Match`). Registered under scheme `ncs://` over
  * local disk so [[CommitArbitrationSpec]] can demonstrate, on a real
  * FileSystem code path, (a) the hazard bare create-exclusive has
  * there, and (b) the read-back tier of
  * [[graft.core.CommitArbiter.Default]] catching a competing PUT that
  * lands between our PUT and our verify ([[NonConditionalFs.interloper]]
  * injects one at close). */
class NonConditionalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "ncs"
  override def getUri: URI = URI.create("ncs:///")

  // ignore overwrite=false everywhere: a blind PUT never checks
  // existence (both public overloads — FileSystem.create(Path,
  // boolean) routes through the permissionless one)
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    wrap(f, super.create(f, true, bufferSize, replication, blockSize,
      progress))

  override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream =
    wrap(f, super.create(f, permission, true, bufferSize,
      replication, blockSize, progress))

  private def wrap(f: Path, out: FSDataOutputStream): FSDataOutputStream =
    new FSDataOutputStream(new java.io.FilterOutputStream(out) {
      override def close(): Unit = {
        super.close()
        // the "racing writer": its PUT lands right after ours
        NonConditionalFs.interloper.foreach { content =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(f.toUri.getPath),
            content.getBytes("UTF-8"))
        }
      }
    }, null)
}

object NonConditionalFs {
  /** When set, every completed create is immediately overwritten with
    * this content — a deterministic stand-in for the racing PUT. */
  @volatile var interloper: Option[String] = None
}
